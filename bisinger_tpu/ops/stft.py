"""Device-side STFT + mel frontend (jnp).

Mirrors `bisinger_tpu.utils.audio` on device for batched feature
extraction/verification. The window/framing/mel-matmul pipeline maps well
onto XLA: framing is a strided gather, the rFFT runs on the VPU, and the
mel projection is a single MXU matmul over [T, fft//2+1] x [fft//2+1, M].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from bisinger_tpu.utils.audio import hann_window, mel_basis


@partial(jax.jit, static_argnames=("fft_size", "hop_size", "win_size"))
def stft_magnitude(wav, fft_size: int = 512, hop_size: int = 128, win_size: int = 512):
    """wav [..., N] -> |STFT| [..., T, fft//2+1] (librosa center/constant
    padding conventions; see `utils/audio.py`)."""
    window = jnp.asarray(hann_window(win_size), dtype=jnp.float32)
    if win_size < fft_size:
        lpad = (fft_size - win_size) // 2
        window = jnp.pad(window, (lpad, fft_size - win_size - lpad))
    pad = [(0, 0)] * (wav.ndim - 1) + [(fft_size // 2, fft_size // 2)]
    y = jnp.pad(wav, pad)
    n_frames = 1 + (y.shape[-1] - fft_size) // hop_size
    idx = jnp.arange(fft_size)[None, :] + hop_size * jnp.arange(n_frames)[:, None]
    frames = jnp.take(y, idx, axis=-1) * window  # [..., T, fft]
    spec = jnp.fft.rfft(frames, n=fft_size, axis=-1)
    return jnp.abs(spec)


@partial(
    jax.jit,
    static_argnames=(
        "sample_rate",
        "fft_size",
        "hop_size",
        "win_size",
        "num_mels",
        "fmin",
        "fmax",
        "eps",
    ),
)
def log_mel_spectrogram(
    wav,
    sample_rate: int = 24000,
    fft_size: int = 512,
    hop_size: int = 128,
    win_size: int = 512,
    num_mels: int = 80,
    fmin: float = 30,
    fmax: float = 12000,
    eps: float = 1e-6,
):
    """wav [..., N] -> log10-mel [..., T, num_mels]."""
    spc = stft_magnitude(wav, fft_size, hop_size, win_size)
    basis = jnp.asarray(mel_basis(sample_rate, fft_size, num_mels, fmin, fmax))
    mel = jnp.einsum("...tf,mf->...tm", spc, basis)
    return jnp.log10(jnp.maximum(eps, mel))
