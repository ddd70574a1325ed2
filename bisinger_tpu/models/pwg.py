"""ParallelWaveGAN vocoder family (flax.linen).

Behavioural port of the vendored PWG library the reference ships
(`train_bisinger/modules/parallel_wavegan/models/parallel_wavegan.py`,
`layers/upsample.py`, `layers/pqmf.py`):

  - `ParallelWaveGANGenerator`: non-causal WaveNet mapping (noise z,
    upsampled mel aux) -> waveform; 30 dilated residual blocks in 3
    stacks, gated tanh*sigmoid with aux conditioning, skip-sum head;
  - `UpsampleNetwork` / `ConvInUpsampleNetwork`: nearest-stretch +
    freq-preserving 2D convs to raise mel to sample rate;
  - `ParallelWaveGANDiscriminator`: 10-layer dilated conv stack;
  - `PQMF`: kaiser-prototype quadrature-mirror filterbank for multi-band
    variants (analysis/synthesis as strided convs).

Layout [B, T, C]."""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bisinger_tpu.config import HParams


class Stretch2d(nn.Module):
    """Nearest-neighbour time upsampling of a mel 'image' [B, T, M]."""

    t_scale: int

    def __call__(self, x):
        return jnp.repeat(x, self.t_scale, axis=1)


class UpsampleNetwork(nn.Module):
    """Stack of (stretch, freq-preserving conv) stages (reference
    `layers/upsample.py:UpsampleNetwork`)."""

    upsample_scales: Sequence[int]

    @nn.compact
    def __call__(self, c):
        import jax

        for i, scale in enumerate(self.upsample_scales):
            c = Stretch2d(t_scale=scale)(c)
            # reference: ONE Conv2d(1, 1, (1, 2*scale+1), bias=False)
            # time-smoothing kernel SHARED across all mel bins,
            # initialized to the moving average 1/k
            # (`layers/upsample.py:47-99`) — a per-bin depthwise conv
            # would be a different (80x larger) function class
            k = 2 * scale + 1
            w = self.param(
                f"conv_{i}_kernel",
                lambda rng, shape: jnp.full(shape, 1.0 / k, jnp.float32),
                (k, 1, 1),
            )
            n_ch = c.shape[-1]
            c = jax.lax.conv_general_dilated(
                c,
                jnp.tile(w, (1, 1, n_ch)),
                window_strides=(1,),
                padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=n_ch,
            )
        return c


class ConvInUpsampleNetwork(nn.Module):
    """Context conv (aux_context_window) + UpsampleNetwork (reference
    `layers/upsample.py:ConvInUpsampleNetwork`)."""

    upsample_scales: Sequence[int]
    aux_channels: int = 80
    aux_context_window: int = 2

    @nn.compact
    def __call__(self, c):
        k = 2 * self.aux_context_window + 1
        # reference semantics: the wrapper EDGE-pads the mel by the
        # context window and conv_in runs VALID
        # (`vocoders/pwg.py:88-96` + `layers/upsample.py:157`); folded
        # in here so callers feed raw mels. SAME zero-padding would
        # differ at utterance boundaries.
        aw = self.aux_context_window
        if aw > 0:
            c = jnp.pad(c, ((0, 0), (aw, aw), (0, 0)), mode="edge")
        c = nn.Conv(
            self.aux_channels, (k,), padding="VALID", use_bias=False, name="conv_in"
        )(c)
        return UpsampleNetwork(upsample_scales=self.upsample_scales, name="upsample")(c)


class PWGResidualBlock(nn.Module):
    """WaveNet block with aux conditioning (reference
    `layers/residual_block.py`)."""

    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, c):
        residual = x
        y = nn.Conv(
            self.gate_channels,
            (self.kernel_size,),
            kernel_dilation=self.dilation,
            padding="SAME",
            name="conv",
        )(x)
        y = y + nn.Conv(self.gate_channels, (1,), use_bias=False, name="aux_conv")(c)
        a, b = jnp.split(y, 2, axis=-1)
        y = jnp.tanh(a) * jax.nn.sigmoid(b)
        skip = nn.Conv(self.skip_channels, (1,), name="skip_conv")(y)
        out = nn.Conv(self.residual_channels, (1,), name="out_conv")(y)
        return (out + residual) * math.sqrt(0.5), skip


class ParallelWaveGANGenerator(nn.Module):
    """z [B, T_wav] + mel [B, T_mel, 80] -> wav [B, T_wav] (reference
    `models/parallel_wavegan.py:ParallelWaveGANGenerator`)."""

    hp: HParams
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    out_channels: int = 1

    @nn.compact
    def __call__(self, z, mel):
        scales = list(self.hp.get("pwg_upsample_scales", [4, 4, 4, 2]))
        c = ConvInUpsampleNetwork(
            upsample_scales=scales,
            aux_channels=self.aux_channels,
            aux_context_window=self.aux_context_window,
            name="upsample_net",
        )(mel)
        c = c[:, : z.shape[1]]
        x = nn.Conv(self.residual_channels, (1,), name="first_conv")(z[:, :, None])
        layers_per_stack = self.layers // self.stacks
        skips = 0.0
        for i in range(self.layers):
            dilation = 2 ** (i % layers_per_stack)
            x, skip = PWGResidualBlock(
                residual_channels=self.residual_channels,
                gate_channels=self.gate_channels,
                skip_channels=self.skip_channels,
                aux_channels=self.aux_channels,
                dilation=dilation,
                name=f"block_{i}",
            )(x, c)
            skips = skips + skip
        skips = skips * math.sqrt(1.0 / self.layers)
        y = jax.nn.relu(skips)
        y = nn.Conv(self.skip_channels, (1,), name="post_conv_1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.out_channels, (1,), name="post_conv_2")(y)
        return y[..., 0] if self.out_channels == 1 else y


class ParallelWaveGANDiscriminator(nn.Module):
    """10-layer dilated conv discriminator (reference
    `models/parallel_wavegan.py:ParallelWaveGANDiscriminator`)."""

    layers: int = 10
    conv_channels: int = 64
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        x = x[:, :, None]
        for i in range(self.layers - 1):
            dilation = i if i > 0 else 1
            x = nn.Conv(
                self.conv_channels,
                (self.kernel_size,),
                kernel_dilation=dilation,
                padding="SAME",
                name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(1, (self.kernel_size,), padding="SAME", name="conv_out")(x)
        return x[..., 0]


# --------------------------------------------------------------------------
# PQMF (reference `layers/pqmf.py`)
# --------------------------------------------------------------------------
def design_prototype_filter(taps: int = 62, cutoff_ratio: float = 0.15, beta: float = 9.0) -> np.ndarray:
    """Kaiser-windowed sinc prototype lowpass."""
    assert taps % 2 == 0
    omega_c = np.pi * cutoff_ratio
    n = np.arange(taps + 1) - taps / 2
    with np.errstate(invalid="ignore"):
        h_i = np.sin(omega_c * n) / (np.pi * n)
    h_i[taps // 2] = omega_c / np.pi
    w = np.kaiser(taps + 1, beta)
    return h_i * w


class PQMF:
    """Pseudo-QMF analysis/synthesis filterbank (subbands=4)."""

    def __init__(self, subbands: int = 4, taps: int = 62, cutoff_ratio: float = 0.15, beta: float = 9.0):
        self.subbands = subbands
        h_proto = design_prototype_filter(taps, cutoff_ratio, beta)
        h_analysis = np.zeros((subbands, taps + 1))
        h_synthesis = np.zeros((subbands, taps + 1))
        for k in range(subbands):
            arg = (
                (2 * k + 1)
                * (np.pi / (2 * subbands))
                * (np.arange(taps + 1) - taps / 2)
            )
            phase = (-1) ** k * np.pi / 4
            h_analysis[k] = 2 * h_proto * np.cos(arg + phase)
            h_synthesis[k] = 2 * h_proto * np.cos(arg - phase)
        self.h_analysis = jnp.asarray(h_analysis, dtype=jnp.float32)
        self.h_synthesis = jnp.asarray(h_synthesis, dtype=jnp.float32)
        self.taps = taps

    def analysis(self, x):
        """x [B, T] -> subband signals [B, T/subbands, subbands]."""
        pad = self.taps // 2
        kernel = self.h_analysis.T[:, None, :]  # [taps+1, 1, subbands]
        y = jax.lax.conv_general_dilated(
            x[:, :, None],
            kernel,
            window_strides=(self.subbands,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y

    def synthesis(self, x):
        """Subband signals [B, T/subbands, subbands] -> wav [B, T]."""
        b, t, s = x.shape
        # upsample (zero-stuffing) then filter-and-sum
        up = jnp.zeros((b, t * self.subbands, s), x.dtype)
        up = up.at[:, :: self.subbands].set(x * self.subbands)
        pad = self.taps // 2
        kernel = self.h_synthesis.T[:, :, None]  # [taps+1, subbands, 1]
        y = jax.lax.conv_general_dilated(
            up,
            kernel,
            window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y[..., 0]
