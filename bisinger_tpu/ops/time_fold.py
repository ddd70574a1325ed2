"""Exact time-folding of 1D convolutions for narrow-channel TPU stages.

The HiFi-GAN tail runs convs at 32-64 channels over huge T — the matmul
N dimension fills only a quarter of the MXU's 128 lanes (~25% peak,
measured; see BASELINE.md). Folding time into channels,

    x' [B, T/f, f*C]  with  x'[u, s*C + c] = x[f*u + s, c],

turns each conv k over T into an EXACTLY equivalent conv k' over T/f at
f*C channels (a permutation of the same arithmetic), restoring full lane
utilization. The folded kernel is a sparse rearrangement of the original
weights (one static gather), recomputed inside each forward — cheap next
to the convs at inference, but training the vocoder should leave the
fold off so weights aren't rebuilt every step.

Derivation: y[f*u + r] = sum_j x[f*u + r + j - D] W[j]  (SAME, D=(k-1)//2)
with m = r + j - D = f*q + s  ->  y'[u, r*C+co] += x'[u+q, s*C+ci] W'[...]
so W'[q - qmin, s*C + ci, r*C + co] = W[j, ci, co] and the folded conv
uses explicit padding (-qmin, qmax) over u.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fold_conv_weight(
    w: np.ndarray, b: np.ndarray, f: int, dilation: int = 1
) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int]]:
    """w [k, Cin, Cout] (flax Conv, SAME, odd k, dilation d), bias
    [Cout], fold f -> (w' [k', f*Cin, f*Cout], b' [f*Cout],
    padding (lo, hi)) such that
    conv(x', w', padding, dil=1) == fold(conv(x, w, SAME, dil=d))."""
    k, cin, cout = w.shape
    assert k % 2 == 1, "SAME folding assumes odd kernels"
    delta = dilation * (k - 1) // 2
    taps = {}
    for r in range(f):
        for j in range(k):
            m = r + dilation * j - delta
            taps[(m // f, m % f, r)] = j  # (q, s, r) -> unique source tap
    qmin = min(q for q, _, _ in taps)
    qmax = max(q for q, _, _ in taps)
    kf = qmax - qmin + 1
    # one static gather (index k = zero slot) keeps the traced graph tiny
    # — the scatter-add formulation ballooned XLA compile time
    jmap = np.full((kf, f, f), k, np.int32)
    for (q, s, r), j in taps.items():
        jmap[q - qmin, s, r] = j
    wj = jnp.asarray(w)
    wpad = jnp.concatenate([wj, jnp.zeros((1, cin, cout), wj.dtype)], axis=0)
    wf = wpad[jnp.asarray(jmap)]  # [kf, f, f, cin, cout]
    wf = jnp.transpose(wf, (0, 1, 3, 2, 4)).reshape(kf, f * cin, f * cout)
    bf = jnp.tile(jnp.asarray(b), f) if b is not None else None
    return wf, bf, (-qmin, qmax)


def fold_time(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[B, T, C] -> [B, T/f, f*C] (frame-major fold)."""
    b, t, c = x.shape
    assert t % f == 0, (t, f)
    return x.reshape(b, t // f, f * c)


def unfold_time(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[B, T/f, f*C] -> [B, T, C]."""
    b, u, fc = x.shape
    return x.reshape(b, u * f, fc // f)


def folded_conv(x_folded, wf, bf, padding):
    """Apply a folded conv: x' [B, U, fC] -> [B, U, fCout]."""
    y = jax.lax.conv_general_dilated(
        x_folded,
        jnp.asarray(wf),
        window_strides=(1,),
        padding=[padding],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bf is not None:
        y = y + jnp.asarray(bf)[None, None, :]
    return y
