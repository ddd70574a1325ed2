import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bisinger_tpu.config import load_hparams
from bisinger_tpu.models.diffusion import DiffusionBuffers, GaussianDiffusion, make_betas
from bisinger_tpu.models.fs2 import FastSpeech2MIDI
from bisinger_tpu.models.hifigan import HifiGanGenerator, sine_gen
from bisinger_tpu.models.pe import PitchExtractor

VOCAB = 32
B, T_TXT, T_MEL = 2, 8, 40


def tiny_hp(**over):
    hp = load_hparams(
        overrides=dict(
            hidden_size=16,
            enc_layers=1,
            dec_layers=1,
            num_heads=2,
            enc_ffn_kernel_size=3,
            dec_ffn_kernel_size=3,
            residual_layers=2,
            residual_channels=16,
            timesteps=8,
            K_step=8,
            max_frames=T_MEL,
            num_spk=3,
            predictor_layers=2,
            dur_predictor_layers=2,
            use_pitch_embed=False,
            upsample_rates=[4, 4, 2, 2],
            upsample_kernel_sizes=[8, 8, 4, 4],
            upsample_initial_channel=16,
            audio_sample_rate=24000,
            hop_size=64,
        )
    )
    return hp.replace(**over) if over else hp


def midi_batch(rng=0):
    r = np.random.RandomState(rng)
    txt = np.zeros((B, T_TXT), np.int32)
    txt[:, :6] = r.randint(3, VOCAB, (B, 6))
    mel2ph = np.zeros((B, T_MEL), np.int32)
    mel2ph[:, :30] = np.sort(r.randint(1, 7, (B, 30)), axis=1)
    return dict(
        txt_tokens=jnp.asarray(txt),
        mel2ph=jnp.asarray(mel2ph),
        spk_embed=jnp.asarray(r.randint(0, 3, (B,))),
        ref_mels=jnp.asarray(r.randn(B, T_MEL, 80).astype(np.float32)),
        pitch_midi=jnp.asarray(r.randint(50, 70, (B, T_TXT))),
        midi_dur=jnp.asarray(r.rand(B, T_TXT).astype(np.float32)),
        is_slur=jnp.asarray(r.randint(0, 2, (B, T_TXT))),
        lang=jnp.asarray(r.randint(0, 2, (B, T_TXT))),
        speechsing=jnp.asarray(r.randint(0, 3, (B,))),
    )


class TestFastSpeech2MIDI:
    def test_train_forward_shapes(self):
        hp = tiny_hp()
        model = FastSpeech2MIDI(hp=hp, vocab_size=VOCAB)
        batch = midi_batch()
        params = model.init(jax.random.PRNGKey(0), **batch)
        ret = model.apply(params, **batch)
        assert ret["mel_out"].shape == (B, T_MEL, 80)
        assert ret["dur"].shape == (B, T_TXT)
        assert ret["decoder_inp"].shape == (B, T_MEL, 16)
        # padded frames masked out
        assert np.abs(np.asarray(ret["mel_out"][:, 35:])).sum() == 0

    def test_infer_forward_predicts_durations(self):
        hp = tiny_hp()
        model = FastSpeech2MIDI(hp=hp, vocab_size=VOCAB)
        batch = midi_batch()
        params = model.init(jax.random.PRNGKey(0), **batch)
        infer_batch = dict(batch)
        infer_batch["mel2ph"] = None
        ret = model.apply(params, **infer_batch, infer=True)
        assert ret["mel_out"].shape == (B, T_MEL, 80)
        assert ret["mel2ph"].shape == (B, T_MEL)
        assert "dur_choice" in ret

    def test_jit_forward(self):
        hp = tiny_hp()
        model = FastSpeech2MIDI(hp=hp, vocab_size=VOCAB)
        batch = midi_batch()
        params = model.init(jax.random.PRNGKey(0), **batch)
        fwd = jax.jit(lambda p, b: model.apply(p, **b)["mel_out"])
        out = fwd(params, batch)
        assert out.shape == (B, T_MEL, 80)

    def test_pitch_embed_path(self):
        hp = tiny_hp(use_pitch_embed=True, pitch_type="frame")
        model = FastSpeech2MIDI(hp=hp, vocab_size=VOCAB)
        batch = midi_batch()
        r = np.random.RandomState(3)
        batch["f0"] = jnp.asarray(r.rand(B, T_MEL).astype(np.float32) * 5 + 5)
        batch["uv"] = jnp.asarray((r.rand(B, T_MEL) > 0.8).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), **batch)
        ret = model.apply(params, **batch)
        assert "pitch_pred" in ret and ret["pitch_pred"].shape == (B, T_MEL, 2)
        assert ret["f0_denorm"].shape == (B, T_MEL)


class TestDiffusion:
    def test_schedule_buffers(self):
        hp = tiny_hp(schedule_type="linear", max_beta=0.02, timesteps=10)
        betas = make_betas(hp)
        assert betas.shape == (10,)
        assert betas[0] == pytest.approx(1e-4)
        assert betas[-1] == pytest.approx(0.02)
        buf = DiffusionBuffers(betas)
        # q(x_{t}|x_0) coefficients satisfy a^2 + (1-a^2) identity
        np.testing.assert_allclose(
            buf.sqrt_alphas_cumprod ** 2 + buf.sqrt_one_minus_alphas_cumprod ** 2,
            1.0,
            atol=1e-6,
        )

    def test_train_loss(self):
        hp = tiny_hp()
        model = GaussianDiffusion(hp=hp, vocab_size=VOCAB)
        batch = midi_batch()
        params = model.init(
            {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
            **batch,
            method=GaussianDiffusion.init_path,
        )
        ret = model.apply(params, **batch, rng=jax.random.PRNGKey(2))
        assert np.isfinite(float(ret["diff_loss"]))
        assert ret["diff_loss"].shape == ()

    @pytest.mark.parametrize("speedup", [None, 2])
    def test_infer_sampling(self, speedup):
        hp = tiny_hp(pndm_speedup=speedup, gaussian_start=True)
        model = GaussianDiffusion(hp=hp, vocab_size=VOCAB)
        batch = midi_batch()
        params = model.init(
            {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
            **batch,
            method=GaussianDiffusion.init_path,
        )
        ret = model.apply(params, **batch, infer=True, rng=jax.random.PRNGKey(2))
        mel = np.asarray(ret["mel_out"])
        assert mel.shape == (B, T_MEL, 80)
        assert np.isfinite(mel).all()
        assert "fs2_mel" in ret

    def test_shallow_start_uses_fs2_mel(self):
        hp = tiny_hp(gaussian_start=False, pndm_speedup=None)
        model = GaussianDiffusion(hp=hp, vocab_size=VOCAB)
        batch = midi_batch()
        params = model.init(
            {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
            **batch,
            method=GaussianDiffusion.init_path,
        )
        ret = model.apply(params, **batch, infer=True, rng=jax.random.PRNGKey(2))
        assert np.isfinite(np.asarray(ret["mel_out"])).all()


class TestHifiGan:
    def test_sine_gen_voiced_unvoiced(self):
        f0 = jnp.concatenate(
            [jnp.zeros((1, 100, 1)), jnp.full((1, 200, 1), 220.0)], axis=1
        )
        sines, uv, _ = sine_gen(f0, jax.random.PRNGKey(0), 24000)
        assert sines.shape == (1, 300, 9)
        assert uv[0, 0, 0] == 0 and uv[0, 150, 0] == 1
        # voiced region dominated by the sine (amplitude ~0.1)
        assert float(jnp.abs(sines[0, 100:, 0]).max()) < 0.2

    def test_generator_output_length(self):
        hp = tiny_hp()
        t = 12
        mel = jnp.zeros((1, t, 80))
        f0 = jnp.full((1, t), 220.0)
        gen = HifiGanGenerator(hp=hp)
        params = gen.init(
            {"params": jax.random.PRNGKey(0), "nsf": jax.random.PRNGKey(1)}, mel, f0
        )
        wav = gen.apply(params, mel, f0, rngs={"nsf": jax.random.PRNGKey(2)})
        assert wav.shape == (1, t * 64)  # product of upsample rates
        assert np.isfinite(np.asarray(wav)).all()

    def test_generator_no_nsf(self):
        hp = tiny_hp(use_pitch_embed=False)
        mel = jnp.zeros((1, 8, 80))
        gen = HifiGanGenerator(hp=hp)
        params = gen.init(jax.random.PRNGKey(0), mel)
        wav = gen.apply(params, mel)
        assert wav.shape == (1, 8 * 64)


class TestPitchExtractor:
    def test_forward(self):
        hp = tiny_hp()
        pe = PitchExtractor(hp=hp)
        mel = jnp.asarray(np.random.RandomState(0).randn(B, T_MEL, 80).astype(np.float32))
        params = pe.init(jax.random.PRNGKey(0), mel)
        ret = pe.apply(params, mel)
        assert ret["pitch_pred"].shape == (B, T_MEL, 2)
        assert ret["f0_denorm_pred"].shape == (B, T_MEL)


def test_melgan_generator_and_discriminator():
    """MelGAN (reference modules/parallel_wavegan/models/melgan.py):
    mel -> wav upsampled by prod(scales); MSD returns logits+features
    per scale."""
    import jax
    import jax.numpy as jnp

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.models.melgan import (
        MelGanGenerator,
        MelGanMultiScaleDiscriminator,
    )

    hp = load_hparams(
        overrides=dict(melgan_upsample_scales=[4, 4, 2, 2], melgan_channels=64)
    )
    gen = MelGanGenerator(hp=hp)
    mel = jnp.zeros((2, 32, 80))
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    wav = gen.apply({"params": params}, mel)
    assert wav.shape == (2, 32 * 64)

    msd = MelGanMultiScaleDiscriminator()
    dparams = msd.init(jax.random.PRNGKey(1), wav)["params"]
    outs = msd.apply({"params": dparams}, wav)
    assert len(outs) == 3
    logits, feats = outs[0]
    assert logits.ndim == 2 and len(feats) == 6


def test_spec2wav_batch_matches_per_item():
    """Batched vocoding == per-item vocoding (one program, no per-length
    recompiles)."""
    import jax
    import numpy as np

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.vocoders.hifigan import HifiGAN

    hp = load_hparams(
        overrides=dict(
            upsample_rates=[4, 4],
            upsample_kernel_sizes=[8, 8],
            upsample_initial_channel=64,
            use_pitch_embed=False,
            use_nsf=False,
            compute_dtype="float32",
        )
    )
    voc = HifiGAN(hp)
    mels = np.random.default_rng(0).standard_normal((3, 24, 80)).astype(np.float32)
    batch_wavs = voc.spec2wav_batch(mels)
    for b in range(3):
        single = voc.spec2wav(mels[b])
        np.testing.assert_allclose(batch_wavs[b], single, atol=1e-5)


def test_diff_loss_ignores_padded_frames():
    """The diffusion training loss masks bucket-padding frames: garbage
    in mel rows where mel2ph == 0 must not change diff_loss (the
    reference ships the nonpadding call commented out — tolerable with
    its near-exact dynamic shapes, harmful with static buckets)."""
    import jax

    from __graft_entry__ import _batch, _tiny_hp
    from bisinger_tpu.training.tasks import DiffSingerMIDITask

    hp = _tiny_hp()
    task = DiffSingerMIDITask(hp, 32)
    b = _batch(2, 16, 64, 32)
    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, b)

    def diff_loss(mels):
        ret = task.model.apply(
            {"params": state.params},
            txt_tokens=b["txt_tokens"], mel2ph=b["mel2ph"],
            spk_embed=b["spk_ids"], ref_mels=mels,
            pitch_midi=b["pitch_midi"], midi_dur=b["midi_dur"],
            is_slur=b["is_slur"], lang=b["lang"],
            speechsing=b["speechsing"],
            infer=False, rng=rng, deterministic=True,
        )
        return float(ret["diff_loss"])

    clean = diff_loss(b["mels"])
    poisoned = b["mels"].copy()
    poisoned[b["mel2ph"] == 0] = 1e3  # garbage ONLY in padded frames
    assert diff_loss(poisoned) == clean
    assert (b["mel2ph"] == 0).any()  # the batch actually has padding
