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
  - `ResidualParallelWaveGANDiscriminator`: WaveNet-style gated residual
    discriminator (`parallel_wavegan.py:300-431`);
  - `PQMF`: kaiser-prototype quadrature-mirror filterbank for multi-band
    variants (analysis/synthesis as strided convs);
  - cyclic-noise excitation family (`pulse_gen`, `cyclic_noise_gen`,
    `source_module_cyc_noise` — `models/source.py:141-351`), static-shape
    lax versions of the reference's dynamic-length host-loop generators.

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
    def __call__(self, x, c=None):
        residual = x
        y = nn.Conv(
            self.gate_channels,
            (self.kernel_size,),
            kernel_dilation=self.dilation,
            padding="SAME",
            name="conv",
        )(x)
        if c is not None:  # aux_channels=-1 in the reference: no conditioning
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


class ResidualParallelWaveGANDiscriminator(nn.Module):
    """WaveNet-style discriminator: 1x1 in-proj -> `layers` gated residual
    blocks (no aux conditioning) -> sqrt(1/N)-scaled skip sum -> two 1x1
    output convs with leaky_relu (reference
    `models/parallel_wavegan.py:300-431`)."""

    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    kernel_size: int = 3
    out_channels: int = 1

    @nn.compact
    def __call__(self, x):
        assert self.layers % self.stacks == 0
        layers_per_stack = self.layers // self.stacks
        x = nn.Conv(self.residual_channels, (1,), name="first_conv")(x[:, :, None])
        x = nn.leaky_relu(x, 0.2)
        skips = 0.0
        for i in range(self.layers):
            x, skip = PWGResidualBlock(
                residual_channels=self.residual_channels,
                gate_channels=self.gate_channels,
                skip_channels=self.skip_channels,
                kernel_size=self.kernel_size,
                dilation=2 ** (i % layers_per_stack),
                name=f"block_{i}",
            )(x)
            skips = skips + skip
        y = skips * math.sqrt(1.0 / self.layers)
        y = nn.leaky_relu(y, 0.2)
        y = nn.Conv(self.skip_channels, (1,), name="post_conv_1")(y)
        y = nn.leaky_relu(y, 0.2)
        y = nn.Conv(self.out_channels, (1,), name="post_conv_2")(y)
        return y[..., 0] if self.out_channels == 1 else y


# --------------------------------------------------------------------------
# Cyclic-noise excitation source (reference `models/source.py:141-351`)
# --------------------------------------------------------------------------
def pulse_gen(
    f0,
    rng,
    sample_rate: int,
    pulse_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
):
    """Pulse-train generator (reference `PulseGen`, `source.py:141-203`).

    f0: [B, T, 1] at sample rate (0 = unvoiced).
    Returns (pulse_train, sine_wav, uv, pulse_noise), all [B, T, 1].

    The reference resets the sine phase at the last step of every
    unvoiced segment via a per-batch python loop over boolean-indexed
    slices (`source.py:75-102`, flag_for_pulse mode). TPU-native version:
    the same telescoping identity i_phase[t] = cumsum(rad)[t] -
    cumsum(rad)[s(t)], with s(t) = the latest phase-reset index <= t,
    computed with a running `cummax` over reset indices — one fused
    static-shape program, no host loop.
    """
    rad = (f0 / sample_rate) % 1.0  # [B, T, 1]; fundamental only, no
    # initial phase noise (reference zeroes rand_ini on the fundamental)
    uv = (f0 > voiced_threshold).astype(f0.dtype)

    # u_loc: last step of every unvoiced segment (uv[t]==0 & uv[t+1]==1;
    # final step counts as "next is voiced")
    uv_next = jnp.concatenate([uv[:, 1:], jnp.ones_like(uv[:, :1])], axis=1)
    u_loc = (uv < 1) & (uv_next > 0)

    csum = jnp.cumsum(rad, axis=1)
    t_idx = jnp.arange(f0.shape[1])[None, :, None]
    reset_idx = jax.lax.cummax(jnp.where(u_loc, t_idx, -1), axis=1)
    sub = jnp.where(
        reset_idx >= 0,
        jnp.take_along_axis(csum, jnp.maximum(reset_idx, 0), axis=1),
        0.0,
    )
    i_phase = csum - sub
    # first step of a voiced segment is ~cos(0): pulse at voicing onset
    pure_sine = jnp.cos(i_phase * 2 * np.pi) * pulse_amp

    # noise floor in unvoiced regions (the inner SineGen runs with
    # noise_std=0, so voiced noise is zero)
    rng_sine, rng_pulse = jax.random.split(rng)
    noise = (1.0 - uv) * pulse_amp / 3.0 * jax.random.normal(
        rng_sine, pure_sine.shape, dtype=f0.dtype
    )
    sine_wav = pure_sine * uv + noise

    # pulse where the pure sine is a voiced local max, or at a voiced
    # onset (reference `source.py:177-192`)
    sine_prev = jnp.concatenate(
        [pure_sine[:, -1:], pure_sine[:, :-1]], axis=1
    )
    uv_prev = jnp.concatenate([jnp.zeros_like(uv[:, :1]), uv[:, :-1]], axis=1)
    sine_next = jnp.concatenate([pure_sine[:, 1:], pure_sine[:, :1]], axis=1)
    uv_next0 = jnp.concatenate([uv[:, 1:], jnp.zeros_like(uv[:, :1])], axis=1)
    loc = (
        (pure_sine > sine_prev)
        & (pure_sine > sine_next)
        & (uv_prev > 0)
        & (uv_next0 > 0)
        & (uv > 0)
    ) | ((uv_prev < 1) & (uv > 0))
    loc = loc.astype(f0.dtype)

    pulse_noise = noise_std * jax.random.normal(
        rng_pulse, pure_sine.shape, dtype=f0.dtype
    )
    pulse_train = pure_sine * loc + pulse_noise * loc + pulse_noise * (1.0 - uv)
    return pulse_train, sine_wav, uv, pulse_noise


def cyclic_noise_gen(
    f0,
    beta,
    rng,
    sample_rate: int,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
    f0_floor: float = 80.0,
):
    """Cyclic noise: exponentially-decayed noise bursts convolved onto a
    pulse train (reference `CyclicNoiseGen_v1`, `source.py:247-309`).

    Returns (cyc_noise, pulse_train, sine_wav, uv, noise).

    The reference sizes the decayed-noise impulse response dynamically as
    int(4.6 * sr / f0_mean) (`source.py:277`). Static-shape version: a
    fixed kernel of length 4.6 * sr / f0_floor, masked at the same
    -40 dB truncation point 4.6 * sr / f0_mean — identical output, XLA-
    compilable.
    """
    rng_pulse, rng_ir = jax.random.split(rng)
    pulse_train, sine_wav, uv, noise = pulse_gen(
        f0, rng_pulse, sample_rate,
        pulse_amp=1.0, noise_std=noise_std,
        voiced_threshold=voiced_threshold,
    )
    pure_pulse = pulse_train - noise

    n_voiced = jnp.maximum(uv.sum(), 1.0)
    f0_mean = jnp.maximum((f0 * uv).sum() / n_voiced, f0_floor * 0.999)

    # decayed-noise impulse response n[t] * std * exp(-t f0_mean / (beta sr))
    ir_len = int(np.ceil(4.6 * sample_rate / f0_floor))
    t_ir = jnp.arange(ir_len, dtype=f0.dtype)
    decay = jnp.exp(-t_ir * f0_mean / beta / sample_rate)
    trunc = (t_ir < 4.6 * sample_rate / f0_mean).astype(f0.dtype)
    ir = (
        jax.random.normal(rng_ir, (ir_len,), dtype=f0.dtype)
        * noise_std * decay * trunc
    )

    # causal convolution of the pulse train with the IR (reference
    # `SignalsConv1d`, `source.py:206-244`: left-pad, flipped kernel)
    sig = jnp.pad(pure_pulse[..., 0], ((0, 0), (ir_len - 1, 0)))[:, None, :]
    kern = jnp.flip(ir)[None, None, :]
    cyc = jax.lax.conv_general_dilated(
        sig, kern, window_strides=(1,), padding="VALID"
    )[:, 0, :, None]

    any_voiced = (uv.sum() > 0).astype(f0.dtype)
    cyc_noise = cyc * any_voiced + noise * (1.0 - uv)
    return cyc_noise, pulse_train, sine_wav, uv, noise


def source_module_cyc_noise(
    f0_upsampled,
    beta,
    rng,
    sample_rate: int,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
):
    """Cyclic-noise excitation for NSF (reference `SourceModuleCycNoise_v1`,
    `source.py:312-349`): returns (cyc [B,T,1], noise [B,T,1], uv)."""
    rng_cyc, rng_noi = jax.random.split(rng)
    cyc, _pulse, _sine, uv, _n = cyclic_noise_gen(
        f0_upsampled, beta, rng_cyc, sample_rate, noise_std, voiced_threshold
    )
    noise = jax.random.normal(rng_noi, uv.shape, dtype=uv.dtype) * noise_std / 3.0
    return cyc, noise, uv


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


def pqmf_from_hparams(hp):
    """The PQMF used by the multiband fast mode, or None.

    Single construction point for training (`training/vocoder_task.py`),
    inference (`vocoders/hifigan.py`), and bench — the filterbank
    contract (subbands from `vocoder_multiband`, default taps/cutoff)
    must stay identical across them or training and synthesis silently
    diverge."""
    n = int(hp.get("vocoder_multiband", 1) or 1)
    return PQMF(n) if n > 1 else None
