"""Fused single-program serving path (inference/pipeline.py
_make_fused_synth): score -> mel -> f0 -> wav in ONE jit must equal the
three-program staged path (which round-trips mel/f0 through host numpy)."""

import jax
import numpy as np
import pytest

from bisinger_tpu.config import load_hparams
from bisinger_tpu.data.binarizer import M4SingerBinarizer
from bisinger_tpu.data.synthetic import make_synthetic_corpus
from bisinger_tpu.inference.pipeline import SVSInfer
from bisinger_tpu.training.tasks import DiffSingerMIDITask
from bisinger_tpu.utils.text_encoder import build_phone_encoder
from bisinger_tpu.vocoders.hifigan import HifiGAN

SCORE = {
    "text": "SP wo ni hello SP",
    "notes": "rest | C4 | D4 | E4 F4 | rest",
    "notes_duration": "0.1 | 0.3 | 0.3 | 0.2 0.2 | 0.1",
}


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("fused")
    raw = root / "raw"
    make_synthetic_corpus(str(raw), n_items=4, seed=0)
    hp = load_hparams(
        overrides=dict(
            raw_data_dir=str(raw),
            raw_json_fn="meta.json",
            binary_data_dir=str(root / "bin"),
            hidden_size=32, enc_layers=1, dec_layers=1, num_heads=2,
            residual_layers=2, residual_channels=32,
            timesteps=8, K_step=8, pndm_speedup=2,
            dur_predictor_layers=2, predictor_layers=2,
            use_pitch_embed=False, num_spk=4,
            bucket_tokens=[32], bucket_frames=[256],
            upsample_rates=[4, 4, 4, 2], upsample_kernel_sizes=[8, 8, 8, 4],
            upsample_initial_channel=32,
            vocoder_ckpt=str(root / "voc"),
            use_nsf=True,
            test_num=1,
        )
    )
    M4SingerBinarizer(hp).process()
    encoder = build_phone_encoder(hp["binary_data_dir"])
    task = DiffSingerMIDITask(hp, encoder.vocab_size)
    from __graft_entry__ import _batch

    state = task.init_state(
        jax.random.PRNGKey(0), _batch(1, 32, 256, encoder.vocab_size)
    )
    HifiGAN(hp).save_params(0)
    vocoder = HifiGAN(hp)
    assert vocoder.loaded
    infer = SVSInfer(
        hp, diffusion_params=jax.device_get(state.params), vocoder=vocoder
    )
    return infer


def test_fused_is_built(env):
    assert env._fused is not None


def test_fused_matches_staged(env):
    rng = jax.random.PRNGKey(7)
    fused = env.infer_batch([SCORE, SCORE], rng=rng)
    saved = env._fused
    env._fused = None
    try:
        staged = env.infer_batch([SCORE, SCORE], rng=rng)
    finally:
        env._fused = saved
    assert len(fused) == len(staged) == 2
    for a, b in zip(fused, staged):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_infer_once_uses_fused(env):
    wav = env.infer_once(SCORE, rng=jax.random.PRNGKey(3))
    assert wav.ndim == 1 and np.isfinite(wav).all() and wav.size > 0


def test_denoise_disables_fusion(env):
    hp2 = env.hp.replace(use_denoise=True)
    old = env.hp
    env.hp = hp2
    try:
        assert env._make_fused_synth() is None
    finally:
        env.hp = old
