"""Denoise + MFCC utilities (reference vocoders/vocoder_utils.py, pwg.py)."""

import numpy as np

from bisinger_tpu.config import load_hparams
from bisinger_tpu.vocoders.vocoder_utils import denoise, wav2mfcc


def _hp():
    return load_hparams()


def test_denoise_roundtrip():
    """v=0 denoise is a near-perfect STFT/ISTFT round-trip."""
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(24000).astype(np.float32) * 0.1
    out = denoise(wav, v=0.0, hp=_hp())
    n = min(len(out), len(wav))
    # ignore edge frames where the window sum is partial
    assert np.allclose(out[512:n-512], wav[512:n-512], atol=1e-4)


def test_denoise_reduces_noise_floor():
    rng = np.random.default_rng(1)
    t = np.arange(24000) / 24000
    clean = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    noisy = clean + 0.01 * rng.standard_normal(len(t)).astype(np.float32)
    den = denoise(noisy, v=0.05, hp=_hp())
    n = min(len(den), len(clean))
    err_before = np.abs(noisy[:n] - clean[:n]).mean()
    err_after = np.abs(den[512:n-512] - clean[512:n-512]).mean()
    assert err_after < err_before


def test_wav2mfcc_shape():
    rng = np.random.default_rng(2)
    wav = rng.standard_normal(12800).astype(np.float32)
    mfcc = wav2mfcc(wav, _hp())
    assert mfcc.shape[1] == 39
    assert mfcc.shape[0] == 12800 // 128 + 1
    assert np.isfinite(mfcc).all()
