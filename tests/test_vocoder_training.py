import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bisinger_tpu.models.pwg import (
    PQMF,
    ParallelWaveGANDiscriminator,
    ParallelWaveGANGenerator,
)
from bisinger_tpu.training.vocoder_task import HifiGanTask, multi_resolution_stft_loss
from tests.test_models import tiny_hp


class TestHifiGanTask:
    def test_gan_train_step(self):
        hp = tiny_hp(
            use_pitch_embed=True,
            hop_size=64,
            upsample_rates=[4, 4, 2, 2],
            upsample_kernel_sizes=[8, 8, 4, 4],
            upsample_initial_channel=16,
        )
        task = HifiGanTask(hp)
        b, t = 2, 16
        r = np.random.RandomState(0)
        batch = {
            "mels": jnp.asarray(r.randn(b, t, 80).astype(np.float32)),
            "f0": jnp.full((b, t), 220.0),
            "wav": jnp.asarray(r.randn(b, t * 64).astype(np.float32) * 0.1),
        }
        gen_state, disc_state = task.init_states(
            jax.random.PRNGKey(0), batch["mels"], batch["f0"], batch["wav"]
        )
        gen_state, disc_state, metrics = task.train_step(
            gen_state, disc_state, batch, jax.random.PRNGKey(1)
        )
        for k in ("disc_loss", "gen_loss", "gen_mel", "gen_fm", "gen_adv"):
            assert np.isfinite(float(metrics[k])), k

    def test_mrstft_loss_zero_for_identical(self):
        wav = jnp.asarray(np.random.RandomState(0).randn(1, 4000).astype(np.float32))
        sc, mag = multi_resolution_stft_loss(wav, wav)
        assert float(sc) == pytest.approx(0.0, abs=1e-5)
        assert float(mag) == pytest.approx(0.0, abs=1e-5)
        sc2, _ = multi_resolution_stft_loss(wav * 0.5, wav)
        assert float(sc2) > 0.1


class TestPWG:
    def test_generator_shapes(self):
        hp = tiny_hp(hop_size=128)
        gen = ParallelWaveGANGenerator(hp=hp, layers=6, stacks=2)
        t = 8
        z = jnp.zeros((1, t * 128))
        mel = jnp.zeros((1, t, 80))
        params = gen.init(jax.random.PRNGKey(0), z, mel)
        wav = gen.apply(params, z, mel)
        assert wav.shape == (1, t * 128)

    def test_discriminator(self):
        d = ParallelWaveGANDiscriminator(layers=4)
        x = jnp.zeros((2, 1000))
        params = d.init(jax.random.PRNGKey(0), x)
        out = d.apply(params, x)
        assert out.shape == (2, 1000)

    def test_pqmf_roundtrip(self):
        pqmf = PQMF(subbands=4)
        t = np.arange(4096)
        wav = (
            0.5 * np.sin(2 * np.pi * 220 * t / 24000)
            + 0.2 * np.sin(2 * np.pi * 900 * t / 24000)
        ).astype(np.float32)[None]
        sub = pqmf.analysis(jnp.asarray(wav))
        assert sub.shape == (1, 1024, 4)
        rec = np.asarray(pqmf.synthesis(sub))
        assert rec.shape == (1, 4096)
        # near-perfect reconstruction away from edges (group delay ~taps)
        delay = 62
        orig = wav[0, delay : -delay]
        recon = rec[0, 2 * (delay // 2) : 2 * (delay // 2) + len(orig)]
        # align by best correlation shift within a small window
        best = 0.0
        for shift in range(0, 2 * delay):
            seg = rec[0, shift : shift + len(orig)]
            if len(seg) == len(orig):
                c = np.corrcoef(seg, orig)[0, 1]
                best = max(best, c)
        assert best > 0.98


def test_generator_glob_numeric_sort(tmp_path):
    """Mixed-width step fields must load the HIGHEST step, not the
    lexicographically-last name (generator_00004000 vs _000030000 sorts
    wrong as strings — review finding)."""
    import numpy as np

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.vocoders.hifigan import HifiGAN, flatten_params

    hp = load_hparams(
        overrides=dict(
            upsample_initial_channel=32,
            use_pitch_embed=False,
            vocoder_ckpt=str(tmp_path),
        )
    )
    voc = HifiGAN(hp)  # random init (empty dir)
    flat = flatten_params(voc.params)
    # stale 8-digit step 4000 vs newer 9-digit step 30000
    stale = {k: np.asarray(v) for k, v in flat.items()}
    np.savez(tmp_path / "generator_00004000.npz", **stale)
    newer = {k: np.asarray(v) + 1.0 for k, v in flat.items()}
    np.savez(tmp_path / "generator_000030000.npz", **newer)

    loaded = HifiGAN(hp)
    assert loaded.loaded
    got = flatten_params(loaded.params)
    k0 = next(iter(newer))
    np.testing.assert_allclose(np.asarray(got[k0]), newer[k0])
