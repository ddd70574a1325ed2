"""f0 utilities — functional jnp versions of the reference
`train_bisinger/utils/pitch_utils.py`.

All functions are pure (no in-place boolean assignment; `jnp.where`
instead), shape-polymorphic, and safe under `jax.jit`. Numpy twins used by
the host-side binarizer are suffixed `_np`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F0_BIN = 256
F0_MAX = 1100.0
F0_MIN = 50.0
F0_MEL_MIN = 1127 * np.log(1 + F0_MIN / 700)
F0_MEL_MAX = 1127 * np.log(1 + F0_MAX / 700)


def f0_to_coarse(f0):
    """f0 [Hz] -> coarse pitch bin in [1, 255]; bin 0 reserved for padding.

    256-bin mel-scale quantization over 50-1100 Hz (reference
    `pitch_utils.py:22-31`).
    """
    f0_mel = 1127.0 * jnp.log(1.0 + f0 / 700.0)
    scaled = (f0_mel - F0_MEL_MIN) * (F0_BIN - 2) / (F0_MEL_MAX - F0_MEL_MIN) + 1.0
    f0_mel = jnp.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = jnp.clip(f0_mel, 1.0, F0_BIN - 1)
    return jnp.floor(f0_mel + 0.5).astype(jnp.int32)


def f0_to_coarse_np(f0: np.ndarray) -> np.ndarray:
    f0_mel = 1127.0 * np.log(1.0 + f0 / 700.0)
    scaled = (f0_mel - F0_MEL_MIN) * (F0_BIN - 2) / (F0_MEL_MAX - F0_MEL_MIN) + 1.0
    f0_mel = np.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = np.clip(f0_mel, 1.0, F0_BIN - 1)
    coarse = np.rint(f0_mel).astype(np.int64)
    assert coarse.max() <= 255 and coarse.min() >= 1, (coarse.max(), coarse.min())
    return coarse


def norm_f0(f0, uv, pitch_norm: str = "log", f0_mean: float = 0.0, f0_std: float = 1.0, use_uv: bool = True):
    """Normalize f0 (log2 or standardized); zero out unvoiced frames
    (reference `pitch_utils.py:34-42`)."""
    if pitch_norm == "standard":
        f0 = (f0 - f0_mean) / f0_std
    elif pitch_norm == "log":
        f0 = jnp.log2(jnp.maximum(f0, 1e-8))
    if uv is not None and use_uv:
        f0 = jnp.where(uv > 0, 0.0, f0)
    return f0


def denorm_f0(
    f0,
    uv,
    pitch_norm: str = "log",
    f0_mean: float = 0.0,
    f0_std: float = 1.0,
    use_uv: bool = True,
    pitch_padding=None,
    min_val=None,
    max_val=None,
):
    """Inverse of `norm_f0` (reference `pitch_utils.py:63-76`)."""
    if pitch_norm == "standard":
        f0 = f0 * f0_std + f0_mean
    elif pitch_norm == "log":
        f0 = 2.0 ** f0
    if min_val is not None:
        f0 = jnp.maximum(f0, min_val)
    if max_val is not None:
        f0 = jnp.minimum(f0, max_val)
    if uv is not None and use_uv:
        f0 = jnp.where(uv > 0, 0.0, f0)
    if pitch_padding is not None:
        f0 = jnp.where(pitch_padding, 0.0, f0)
    return f0


def norm_interp_f0_np(f0: np.ndarray, pitch_norm: str = "log", f0_mean: float = 0.0, f0_std: float = 1.0, use_uv: bool = True):
    """Host-side: normalize f0 then linearly interpolate through unvoiced
    gaps; returns (f0_interp, uv) (reference `pitch_utils.py:45-60`)."""
    uv = f0 == 0
    f0 = np.asarray(f0, dtype=np.float64)
    if pitch_norm == "standard":
        f0_norm = (f0 - f0_mean) / f0_std
    elif pitch_norm == "log":
        f0_norm = np.log2(np.maximum(f0, 1e-8))
    else:
        f0_norm = f0.copy()
    if use_uv:
        f0_norm[uv] = 0
    if uv.sum() == len(f0):
        f0_norm[uv] = 0
    elif uv.sum() > 0:
        f0_norm[uv] = np.interp(np.where(uv)[0], np.where(~uv)[0], f0_norm[~uv])
    return f0_norm.astype(np.float32), uv.astype(np.float32)


def freq_to_midi(frequency: float) -> int:
    """Hz -> nearest MIDI note number (0 for unvoiced/invalid). Single
    shared helper — tools/db4_meta.py and tools/pitch_shift.py carried
    drifting copies (int(round()) vs round())."""
    import math

    if frequency <= 0:
        return 0
    return int(round(69 + 12 * math.log2(frequency / 440.0)))
