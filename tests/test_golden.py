"""Golden-file regression suite: fixed-seed outputs of numerics-critical
paths vs recorded fixtures (SURVEY.md §4's gap-fill — the reference has
no test suite at all). Regenerate deliberately with
`python tests/golden/generate.py` when numerics change on purpose."""

import os

import jax
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} missing; run tests/golden/generate.py")
    return np.load(path)


def test_golden_dsp_mel():
    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.utils import audio as A

    g = _load("dsp_mel.npz")
    hp = load_hparams()
    rng = np.random.default_rng(1234)
    t = np.arange(24000 // 2) / 24000.0
    wav = (
        0.5 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(len(t))
    ).astype(np.float32)
    np.testing.assert_allclose(wav[:2048], g["wav"], atol=0)  # same stimulus
    _, mel = A.wav2spec(
        wav,
        sample_rate=hp["audio_sample_rate"],
        fft_size=hp["fft_size"],
        hop_size=hp["hop_size"],
        win_size=hp["win_size"],
        num_mels=hp["audio_num_mel_bins"],
        fmin=hp["fmin"],
        fmax=hp["fmax"],
        eps=1e-6,
    )
    np.testing.assert_allclose(mel, g["mel"], rtol=1e-5, atol=1e-5)


def test_golden_fs2_forward():
    from __graft_entry__ import _batch, _tiny_hp
    from bisinger_tpu.training.tasks import AuxDecoderMIDITask

    g = _load("fs2_forward.npz")
    # the fixture was recorded with fp32 activations; pin the dtype so the
    # golden locks fp32 semantics regardless of the production default
    hp = _tiny_hp().replace(compute_dtype="float32")
    task = AuxDecoderMIDITask(hp, 32)
    batch = _batch(2, 16, 64, 32)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    ret = task._forward(state.params, batch, jax.random.PRNGKey(1), deterministic=True)
    np.testing.assert_allclose(
        np.asarray(ret["mel_out"]), g["mel_out"], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(ret["dur"]), g["dur"], rtol=1e-4, atol=1e-4)


def test_golden_diffusion_infer():
    from __graft_entry__ import _batch, _tiny_hp
    from bisinger_tpu.training.tasks import DiffSingerMIDITask

    g = _load("diffusion_infer.npz")
    hp = _tiny_hp()
    task = DiffSingerMIDITask(hp, 32)
    batch = _batch(2, 16, 64, 32)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    ret = task.infer_step(state.params, batch, jax.random.PRNGKey(2))
    # a full multi-step sampler chain compounds fp noise: looser tolerance
    np.testing.assert_allclose(
        np.asarray(ret["mel_out"]), g["mel_out"], rtol=1e-3, atol=1e-3
    )
