"""Exact sub-pixel (phase-packed) lowering for strided transpose convs.

The HiFi-GAN upsample stages are `ConvTranspose1d(k, stride u,
pad (k-u)//2)` (reference `modules/hifigan/hifigan.py:118-125`). XLA
lowers `lax.conv_transpose` as a regular convolution over the
zero-dilated input (lhs_dilation=u): every output sample multiplies all
k kernel taps even though only ~k/u of the dilated inputs are nonzero —
for the first stage (k=16, u=8) that is 8x wasted MACs unless the
compiler recovers the sparsity.

The phase decomposition does the same arithmetic densely. Writing the
output index n = m*u + r (phase r in [0, u)):

    y[m*u + r] = sum_e x[m + e] * W[e*u + pad_a - r]

with pad_a the left pad of XLA's dilated-conv view, and e ranging over
the few integers keeping the tap index inside [0, k). Packing all u
phases into channels gives ONE small dense conv

    out[m, r*Cout + c] = sum_t x[m + t + e_min] * K2[t, :, r*Cout + c]

followed by a [B, T, u, Cout] -> [B, T*u, Cout] reshape (periodic
shuffle / "depth-to-time"). n_taps = e_max - e_min + 1 = ceil(k/u) + 1
taps instead of k: for k=2u that is 3*u MACs per input position vs k*u
naive — and the conv's N dimension becomes u*Cout, filling the MXU's
128 lanes even for the narrow tail stages.

The packed kernel K2 is a static gather of the flax `nn.ConvTranspose`
kernel [k, Cin, Cout] (zero-filled outside [0, k)), so the param tree —
and therefore checkpoints and the torch importer — are unchanged;
`vocoder_subpixel: true` switches only the lowering. Exactness vs
`nn.ConvTranspose(padding="SAME")` is asserted in
`tests/test_subpixel.py` for every (k, u) the configs use.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _conv_transpose_pad_a(k: int, s: int) -> int:
    """Left pad of the dilated-conv view for padding='SAME', matching
    jax's `_conv_transpose_padding` (lax.conv_transpose)."""
    pad_len = k + s - 2
    if s > k - 1:
        return k - 1
    return int(math.ceil(pad_len / 2))


def subpixel_plan(k: int, u: int) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Static gather plan for the packed kernel.

    Returns (tap_index [n_taps, u], valid_mask [n_taps, u], e_min, e_max)
    where tap_index[t, r] is the index j into the transpose kernel W[j]
    contributing x[m + t + e_min] to output phase r (0 where invalid).
    """
    pad_a = _conv_transpose_pad_a(k, u)
    rs = np.arange(u)
    e_min = int(np.min(np.ceil((rs - pad_a) / u)))
    e_max = int(np.max(np.floor((k - 1 - pad_a + rs) / u)))
    n_taps = e_max - e_min + 1
    taps = np.zeros((n_taps, u), np.int64)
    mask = np.zeros((n_taps, u), bool)
    for t in range(n_taps):
        e = t + e_min
        j = e * u + pad_a - rs  # [u]
        ok = (j >= 0) & (j < k)
        taps[t] = np.where(ok, j, 0)
        mask[t] = ok
    return taps, mask, e_min, e_max


def pack_transpose_kernel(kernel: jax.Array, u: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """kernel [k, Cin, Cout] (flax ConvTranspose layout) -> packed
    K2 [n_taps, Cin, u*Cout] plus the explicit conv padding (lo, hi)."""
    k, cin, cout = kernel.shape
    taps, mask, e_min, e_max = subpixel_plan(k, u)
    # [n_taps, u, Cin, Cout]: tap t, phase r
    gathered = kernel[taps] * jnp.asarray(mask, kernel.dtype)[:, :, None, None]
    # channels ordered r*Cout + c -> transpose to [n_taps, Cin, u, Cout]
    packed = jnp.transpose(gathered, (0, 2, 1, 3)).reshape(
        taps.shape[0], cin, u * cout
    )
    return packed, (-e_min, e_max)


def conv_transpose_subpixel(x: jax.Array, kernel: jax.Array, u: int) -> jax.Array:
    """x [B, T, Cin], kernel [k, Cin, Cout] -> y [B, T*u, Cout], exactly
    equal to flax `nn.ConvTranspose(Cout, (k,), strides=(u,),
    padding='SAME')` with the same kernel (bias excluded)."""
    cout = kernel.shape[-1]
    packed, pad = pack_transpose_kernel(kernel, u)
    out = jax.lax.conv_general_dilated(
        x,
        packed.astype(x.dtype),
        window_strides=(1,),
        padding=[pad],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )  # [B, T, u*Cout]
    b, t_in, _ = out.shape
    return out.reshape(b, t_in * u, cout)


class UpsampleConvTranspose(nn.Module):
    """Drop-in ConvTranspose1d(k, u, pad=(k-u)//2) with a selectable
    lowering: `subpixel=False` reproduces flax `nn.ConvTranspose`
    (lax.conv_transpose, SAME); `subpixel=True` runs the phase-packed
    dense conv above. Param tree ({kernel [k,Cin,Cout], bias [Cout]})
    is identical to `nn.ConvTranspose`, so checkpoints and the torch
    importer see no difference.
    """

    features: int
    kernel_size: int
    stride: int
    subpixel: bool = False
    dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (self.kernel_size, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if self.subpixel:
            y = conv_transpose_subpixel(x, kernel, self.stride)
        else:
            y = jax.lax.conv_transpose(
                x,
                kernel,
                strides=(self.stride,),
                padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        return y + bias.astype(self.dtype)
