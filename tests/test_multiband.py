"""Multiband HiFi-GAN fast mode (`vocoder_multiband`): the generator
emits PQMF subbands at sample_rate/n — the expensive tail MRF stages run
n x shorter in time — and PQMF synthesis reconstructs the full-rate wav
in the same jitted program. A trained-mode variant (subband weights are
not derivable from full-band checkpoints); see models/hifigan.py."""

import jax
import jax.numpy as jnp
import numpy as np

from bisinger_tpu.config import load_hparams


def _mb_hp(**kw):
    return load_hparams(
        overrides=dict(
            vocoder_multiband=4,
            # prod(rates) * multiband == hop_size (128)
            upsample_rates=[8, 4],
            upsample_kernel_sizes=[16, 8],
            upsample_initial_channel=32,
            use_nsf=True,
            **kw,
        )
    )


def test_multiband_generator_emits_subbands():
    from bisinger_tpu.models.hifigan import HifiGanGenerator

    hp = _mb_hp()
    model = HifiGanGenerator(hp=hp)
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (2, 16, 80))
    f0 = jnp.full((2, 16), 220.0)
    params = model.init({"params": rng, "nsf": rng}, mel, f0)["params"]
    out = model.apply({"params": params}, mel, f0, rngs={"nsf": rng})
    # subbands at sample_rate/4: T * prod(rates) = 16*32 frames, 4 bands
    assert out.shape == (2, 16 * 32, 4)
    # the NSF noise conv of the LAST stage strides the full-rate source
    # down by the multiband factor (kernel 2n instead of the full-band
    # mode's 1x1)
    assert params["noise_conv_1"]["kernel"].shape[0] == 8


def test_multiband_wrapper_reconstructs_full_rate():
    from bisinger_tpu.vocoders.hifigan import HifiGAN

    hp = _mb_hp()
    voc = HifiGAN(hp)  # random init (no checkpoint)
    mel = np.random.RandomState(0).randn(24, 80).astype(np.float32)
    f0 = np.full(24, 220.0, np.float32)
    wav = np.asarray(voc.spec2wav(mel, f0))
    assert wav.shape == (24 * hp["hop_size"],)
    assert np.isfinite(wav).all()


def test_multiband_gan_train_step():
    from bisinger_tpu.training.vocoder_task import HifiGanTask

    hp = _mb_hp()
    task = HifiGanTask(hp)
    rng = jax.random.PRNGKey(0)
    r = np.random.RandomState(0)
    mel = r.randn(2, 8, 80).astype(np.float32)
    f0 = np.full((2, 8), 220.0, np.float32)
    wav = (r.randn(2, 8 * hp["hop_size"]) * 0.1).astype(np.float32)
    gen_state, disc_state = task.init_states(rng, mel, f0, wav)
    batch = {"mels": mel, "f0": f0, "wav": wav}
    gen_state, disc_state, metrics = task.train_step(
        gen_state, disc_state, batch, rng
    )
    for k, v in jax.device_get(metrics).items():
        assert np.isfinite(v), (k, v)


def test_full_band_mode_unchanged():
    """multiband=1 (default) keeps the original output contract and the
    1x1 last-stage noise conv, so existing checkpoints stay loadable."""
    from bisinger_tpu.models.hifigan import HifiGanGenerator

    hp = load_hparams(
        overrides=dict(upsample_initial_channel=32, use_nsf=True)
    )
    model = HifiGanGenerator(hp=hp)
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (1, 8, 80))
    f0 = jnp.full((1, 8), 220.0)
    params = model.init({"params": rng, "nsf": rng}, mel, f0)["params"]
    out = model.apply({"params": params}, mel, f0, rngs={"nsf": rng})
    assert out.shape == (1, 8 * hp["hop_size"])
    last = len(hp["upsample_rates"]) - 1
    assert params[f"noise_conv_{last}"]["kernel"].shape[0] == 1
