import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bisinger_tpu.config import load_hparams
from bisinger_tpu.models.diffnet import FFTDenoiser
from bisinger_tpu.models.diffusion import (
    GaussianDiffusion,
    OfflineGaussianDiffusion,
    PlainGaussianDiffusion,
)
from bisinger_tpu.models.fs2 import FastSpeech2MIDI
from bisinger_tpu.utils.cwt import (
    convert_continuous_f0,
    cwt2f0,
    f0_to_cwt_spec,
    get_cont_lf0,
    inverse_cwt,
    mexican_hat_cwt,
)

from tests.test_models import B, T_MEL, T_TXT, VOCAB, midi_batch, tiny_hp


class TestCWT:
    def test_continuous_f0(self):
        f0 = np.array([0, 0, 100, 0, 200, 0], np.float32)
        uv, cont = convert_continuous_f0(f0)
        assert uv.tolist() == [0, 0, 1, 0, 1, 0]
        assert cont[0] == 100 and cont[-1] == 200
        assert cont[3] == pytest.approx(150)

    def test_mexican_hat_cwt_shape(self):
        x = np.sin(np.linspace(0, 20, 300)).astype(np.float64)
        w, scales = mexican_hat_cwt(x)
        assert w.shape == (300, 10)
        assert scales.shape == (10,)
        assert np.isfinite(w).all()

    def test_forward_inverse_roundtrip_correlation(self):
        # f0 contour -> cwt -> inverse should correlate strongly with the
        # standardized log-f0 (the reconstruction is approximate by design)
        t = np.arange(400)
        f0 = (220 + 40 * np.sin(2 * np.pi * t / 100)).astype(np.float32)
        _, lf0 = get_cont_lf0(f0)
        mean, std = lf0.mean(), lf0.std()
        spec, _, _ = f0_to_cwt_spec(f0, mean, std)
        rec = np.asarray(inverse_cwt(jnp.asarray(spec)[None]))[0]
        target = (lf0 - mean) / std
        corr = np.corrcoef(rec[50:-50], target[50:-50])[0, 1]
        assert corr > 0.8

    def test_cwt2f0_range(self):
        t = np.arange(300)
        f0 = (200 + 30 * np.sin(2 * np.pi * t / 80)).astype(np.float32)
        _, lf0 = get_cont_lf0(f0)
        spec, _, _ = f0_to_cwt_spec(f0, lf0.mean(), lf0.std())
        f0_rec = np.asarray(
            cwt2f0(
                jnp.asarray(spec)[None],
                jnp.asarray([lf0.mean()]),
                jnp.asarray([lf0.std()]),
            )
        )[0]
        # reconstructed f0 in a plausible range around the original
        assert 100 < np.median(f0_rec) < 400


class TestCwtPitchPath:
    def test_fs2_cwt_forward(self):
        hp = tiny_hp(use_pitch_embed=True, pitch_type="cwt", cwt_hidden_size=8)
        model = FastSpeech2MIDI(hp=hp, vocab_size=VOCAB)
        batch = midi_batch()
        params = model.init(jax.random.PRNGKey(0), **batch)
        ret = model.apply(params, **batch)
        assert ret["cwt"].shape == (B, T_MEL, 11)  # 10 + uv
        assert ret["f0_mean"].shape == (B,)
        assert ret["mel_out"].shape == (B, T_MEL, 80)


class TestDiffusionVariants:
    def test_fft_denoiser(self):
        hp = tiny_hp()
        d = FFTDenoiser(hp=hp)
        x = jnp.zeros((B, T_MEL, 80))
        t = jnp.zeros((B,), jnp.int32)
        cond = jnp.zeros((B, T_MEL, 16))
        params = d.init(jax.random.PRNGKey(0), x, t, cond)
        out = d.apply(params, x, t, cond)
        assert out.shape == (B, T_MEL, 80)
        # precomputed cond path gives the same result
        cond_proj = d.apply(params, cond, method=FFTDenoiser.cond_projections)
        out2 = d.apply(params, x, t, cond_proj=cond_proj)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)

    def test_fft_decoder_type_in_diffusion(self):
        hp = tiny_hp(diff_decoder_type="fft")
        model = GaussianDiffusion(hp=hp, vocab_size=VOCAB)
        batch = midi_batch()
        params = model.init(
            {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
            **batch,
            method=GaussianDiffusion.init_path,
        )
        ret = model.apply(params, **batch, rng=jax.random.PRNGKey(2))
        assert np.isfinite(float(ret["diff_loss"]))

    def test_offline_diffusion(self):
        hp = tiny_hp(gaussian_start=False)
        model = OfflineGaussianDiffusion(hp=hp, vocab_size=VOCAB)
        batch = midi_batch()
        gt = batch.pop("ref_mels")
        fs2_mel = gt * 0.9
        init_batch = dict(batch, ref_mels=gt)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
            **init_batch,
            method=OfflineGaussianDiffusion.init_path,
        )
        ret = model.apply(
            params, **batch, ref_mels=(gt, fs2_mel), rng=jax.random.PRNGKey(2)
        )
        assert np.isfinite(float(ret["diff_loss"]))
        ret = model.apply(
            params, **batch, ref_mels=(gt, fs2_mel), infer=True,
            rng=jax.random.PRNGKey(2),
        )
        assert ret["mel_out"].shape == (B, T_MEL, 80)

    def test_plain_diffusion_full_t(self):
        hp = tiny_hp(K_step=2, timesteps=6, gaussian_start=True, pndm_speedup=None)
        model = PlainGaussianDiffusion(hp=hp, vocab_size=VOCAB)
        batch = midi_batch()
        params = model.init(
            {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
            **batch,
            method=PlainGaussianDiffusion.init_path,
        )
        ret = model.apply(params, **batch, infer=True, rng=jax.random.PRNGKey(2))
        assert np.isfinite(np.asarray(ret["mel_out"])).all()
