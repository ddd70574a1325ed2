"""HiFi-GAN generator with NSF harmonic source, plus discriminators.

Behavioural port of `train_bisinger/modules/hifigan/hifigan.py` and the
NSF source module (`modules/parallel_wavegan/models/source.py:8-138,
352-399`) to flax.linen, [B, T, C] layout:

  - conv_pre(80->C0, k7) -> per stage: leaky_relu -> ConvTranspose up ->
    (+ strided noise_conv of the harmonic source, relu + layer_norm) ->
    MRF (mean of ResBlock1 k in {3,7,11}, dilations (1,3,5)) ->
    conv_post(k7) -> tanh;
  - NSF: f0 per frame -> repeat to sample rate -> SineGen harmonic bank
    (phase-cumsum with the wrap-shift trick for fp32 stability) -> tanh
    linear merge -> injected after each upsample stage.

TPU notes: ConvTranspose1d maps to `lax.conv_transpose`. The module
itself holds PLAIN kernels; the reference's weight_norm training
geometry lives in the GAN task (`training/weight_norm.py` — (g, v)
decompose/compose around this module, folded back on export), so
inference and checkpoint formats are unchanged.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bisinger_tpu.config import HParams
from bisinger_tpu.ops.subpixel import UpsampleConvTranspose

LRELU_SLOPE = 0.1

conv_init = nn.initializers.normal(stddev=0.01)  # reference init_weights


# --------------------------------------------------------------------------
# NSF source
# --------------------------------------------------------------------------
def sine_gen(
    f0,
    rng,
    sample_rate: int,
    harmonic_num: int = 8,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
):
    """Harmonic sine bank from upsampled f0 (reference `SineGen`,
    `source.py:8-138`).

    f0: [B, T, 1] at sample rate (0 = unvoiced).
    Returns (sine_waves [B, T, H+1], uv [B, T, 1], noise).
    """
    b, t, _ = f0.shape
    dim = harmonic_num + 1
    mult = jnp.arange(1, dim + 1, dtype=f0.dtype)  # fundamental + overtones
    f0_buf = f0 * mult[None, None, :]  # [B, T, dim]

    rad = (f0_buf / sample_rate) % 1.0
    rng_phase, rng_noise = jax.random.split(rng)
    rand_ini = jax.random.uniform(rng_phase, (b, dim), dtype=f0.dtype)
    rand_ini = rand_ini.at[:, 0].set(0.0)  # no phase noise on the fundamental
    rad = rad.at[:, 0, :].add(rand_ini)

    # fp32-stable phase accumulation: subtract 1 whenever the running sum
    # wraps so the cumsum argument stays bounded (reference trick,
    # `source.py:63-74`)
    tmp_over_one = jnp.cumsum(rad, axis=1) % 1.0
    wrap = (tmp_over_one[:, 1:, :] - tmp_over_one[:, :-1, :]) < 0
    shift = jnp.pad(wrap.astype(f0.dtype) * -1.0, ((0, 0), (1, 0), (0, 0)))
    sines = jnp.sin(jnp.cumsum(rad + shift, axis=1) * 2 * np.pi)

    uv = (f0 > voiced_threshold).astype(f0.dtype)  # [B, T, 1]
    noise_amp = uv * noise_std + (1.0 - uv) * sine_amp / 3.0
    noise = noise_amp * jax.random.normal(rng_noise, sines.shape, dtype=f0.dtype)
    sine_waves = sines * sine_amp * uv + noise
    return sine_waves, uv, noise


class SourceModuleHnNSF(nn.Module):
    """Merge the harmonic bank into one excitation channel
    (reference `source.py:352-399`)."""

    sample_rate: int
    harmonic_num: int = 8
    sine_amp: float = 0.1
    add_noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(self, f0, rng):
        sine_wavs, uv, _ = sine_gen(
            f0,
            rng,
            self.sample_rate,
            self.harmonic_num,
            self.sine_amp,
            self.add_noise_std,
            self.voiced_threshold,
        )
        sine_merge = jnp.tanh(nn.Dense(1, name="merge")(sine_wavs))
        return sine_merge, uv


# --------------------------------------------------------------------------
# Generator
# --------------------------------------------------------------------------
class _ConvParams(nn.Module):
    """Parameter-only stand-in for nn.Conv — same {kernel, bias} tree so
    checkpoints and the torch importer stay compatible — used by the
    time-folded resblock which applies the weights itself."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", conv_init, (self.kernel_size, self.features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _MRFBank(nn.Module):
    """Parameter bank with the exact ResBlock1 tree ({conv1_i, conv2_i}
    x {kernel, bias}) for the fused Pallas MRF path, which applies the
    weights itself (`ops/mrf_pallas.py`)."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self):
        out = {}
        for i in range(len(self.dilations)):
            for which in (1, 2):
                w, b = _ConvParams(
                    self.channels, self.kernel_size, name=f"conv{which}_{i}"
                )()
                out[f"conv{which}_{i}"] = {"kernel": w, "bias": b}
        return out


class FoldedResBlock1(nn.Module):
    """ResBlock1 computed in time-folded space [B, T/f, f*C] with
    exactly-equivalent folded weights (`ops/time_fold.py`): the narrow-C
    tail stages fill the MXU's 128 lanes instead of C of them. Same
    parameter tree as ResBlock1. Input/output are ALREADY folded."""

    channels: int
    fold: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xf):
        from bisinger_tpu.ops.time_fold import fold_conv_weight, folded_conv

        for i, d in enumerate(self.dilations):
            w1, b1 = _ConvParams(
                self.channels, self.kernel_size, name=f"conv1_{i}"
            )()
            w2, b2 = _ConvParams(
                self.channels, self.kernel_size, name=f"conv2_{i}"
            )()
            y = nn.leaky_relu(xf, LRELU_SLOPE)
            wf, bf, pad = fold_conv_weight(
                w1.astype(self.dtype), b1.astype(self.dtype), self.fold, dilation=d
            )
            y = folded_conv(y.astype(self.dtype), wf, bf, pad)
            y = nn.leaky_relu(y, LRELU_SLOPE)
            wf, bf, pad = fold_conv_weight(
                w2.astype(self.dtype), b2.astype(self.dtype), self.fold
            )
            y = folded_conv(y.astype(self.dtype), wf, bf, pad)
            xf = xf + y
        return xf


class ResBlock1(nn.Module):
    """MRF residual block: 3x (lrelu->dilated conv->lrelu->conv)
    (reference `hifigan.py:30-67`)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            y = nn.leaky_relu(x, LRELU_SLOPE)
            y = nn.Conv(
                self.channels,
                (self.kernel_size,),
                kernel_dilation=d,
                padding="SAME",
                kernel_init=conv_init,
                dtype=self.dtype,
                name=f"conv1_{i}",
            )(y)
            y = nn.leaky_relu(y, LRELU_SLOPE)
            y = nn.Conv(
                self.channels,
                (self.kernel_size,),
                padding="SAME",
                kernel_init=conv_init,
                dtype=self.dtype,
                name=f"conv2_{i}",
            )(y)
            x = x + y
        return x


class ResBlock2(nn.Module):
    """Lighter MRF block (reference `hifigan.py:70-91`)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            y = nn.leaky_relu(x, LRELU_SLOPE)
            y = nn.Conv(
                self.channels,
                (self.kernel_size,),
                kernel_dilation=d,
                padding="SAME",
                kernel_init=conv_init,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(y)
            x = x + y
        return x


class HifiGanGenerator(nn.Module):
    """mel [B, T, 80] (+ f0 [B, T]) -> waveform [B, T*hop]
    (reference `HifiGanGenerator`, `hifigan.py:104-173`)."""

    hp: HParams
    c_out: int = 1

    @nn.compact
    def __call__(self, mel, f0=None, rng: Optional[jax.Array] = None):
        hp = self.hp
        rates = list(hp["upsample_rates"])
        kernels = list(hp["upsample_kernel_sizes"])
        rk = list(hp["resblock_kernel_sizes"])
        rd = [tuple(d) for d in hp["resblock_dilation_sizes"]]
        c0 = hp["upsample_initial_channel"]
        resblock = ResBlock1 if str(hp.get("resblock", "1")) == "1" else ResBlock2
        dtype = jnp.bfloat16 if hp.get("compute_dtype") == "bfloat16" else jnp.float32
        # Multiband fast mode: emit `vocoder_multiband` PQMF subbands at
        # sample_rate/n instead of one full-rate waveform — the conv
        # stack stops n x earlier in time, cutting the expensive tail MRF
        # stages by the same factor; `PQMF(n).synthesis` (models/pwg.py)
        # reconstructs the full-rate wav. Contract:
        # prod(upsample_rates) * n == hop_size. A TRAINED-mode variant
        # (subband weights are not derivable from full-band checkpoints).
        multiband = int(hp.get("vocoder_multiband", 1))
        c_out = multiband if multiband > 1 else self.c_out
        # NSF is active whenever an f0 track is provided — the wrapper
        # (vocoders/hifigan.py) gates passing f0 on `use_nsf`. Gating on
        # `use_pitch_embed` here (an ACOUSTIC-model flag) silently ran
        # the NSF-trained weights as a plain mel vocoder whenever the
        # acoustic config disabled its pitch embedding.
        use_nsf = f0 is not None

        if use_nsf:
            if rng is None:
                rng = self.make_rng("nsf")
            # the harmonic source always lives at the FULL sample rate
            # (subband-rate sines would alias the upper harmonics); the
            # per-stage noise_convs stride it down to each stage's rate
            total_up = int(np.prod(rates)) * multiband
            # nearest-neighbour upsample f0 to sample rate (torch Upsample default)
            f0_up = jnp.repeat(f0, total_up, axis=1)[:, :, None]
            har_source, _uv = SourceModuleHnNSF(
                sample_rate=hp["audio_sample_rate"], harmonic_num=8, name="m_source"
            )(f0_up, rng)  # [B, T*hop, 1]

        # long-form mode: shard mel frames (and the sample-rate harmonic
        # source) over the 'seq' mesh axis; GSPMD halo-exchanges the conv
        # edges at every upsample/MRF stage (parallel/sequence.py)
        from bisinger_tpu.parallel.sequence import constrain_time

        mel = constrain_time(mel, hp)
        if use_nsf:
            har_source = constrain_time(har_source, hp)

        x = nn.Conv(c0, (7,), padding="SAME", dtype=dtype, name="conv_pre")(mel)
        for i, (u, k) in enumerate(zip(rates, kernels)):
            c_cur = c0 // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            # SAME transpose-conv == torch ConvTranspose1d(k, u, pad=(k-u)//2):
            # output length exactly T*u. `vocoder_subpixel: true` swaps
            # the lowering for the exact phase-packed dense conv
            # (ops/subpixel.py) — same params, same arithmetic, no
            # zero-dilated MACs, u*C output channels fill the MXU lanes.
            x = UpsampleConvTranspose(
                features=c_cur,
                kernel_size=k,
                stride=u,
                subpixel=bool(hp.get("vocoder_subpixel")),
                kernel_init=conv_init,
                dtype=dtype,
                name=f"up_{i}",
            )(x)
            if use_nsf:
                stride_f0 = int(np.prod(rates[i + 1 :])) * multiband
                if stride_f0 > 1:
                    xs = nn.Conv(
                        c_cur,
                        (stride_f0 * 2,),
                        strides=(stride_f0,),
                        padding=[(stride_f0 // 2, stride_f0 // 2)],
                        dtype=dtype,
                        name=f"noise_conv_{i}",
                    )(har_source)
                else:
                    xs = nn.Conv(c_cur, (1,), dtype=dtype, name=f"noise_conv_{i}")(har_source)
                xs = jax.nn.relu(xs)
                xs = nn.LayerNorm(name=f"noise_norm_{i}")(xs)
                x = x + xs[:, : x.shape[1]]
            # time-fold narrow-channel MRF stages so every conv fills the
            # MXU lanes (exact rewrite of the same arithmetic; see
            # ops/time_fold.py). Fold factor brings channels to >=128.
            fold = 1
            if (
                hp.get("vocoder_time_fold")
                and resblock is ResBlock1
                and c_cur < 128
                and not self.is_initializing()
            ):
                fold = min(int(hp["vocoder_time_fold"]), 128 // c_cur)
                if x.shape[1] % fold != 0:
                    fold = 1
            # folding multiplies FLOPs by ~kf*f/k but quadruples MXU lane
            # utilization — measured faster even for k=3 blocks, so when
            # enabled the whole MRF stage runs folded (exact rewrite)
            if fold > 1:
                from bisinger_tpu.ops.time_fold import fold_time, unfold_time

                x_in = fold_time(x, fold)
            else:
                x_in = x
            # EXPERIMENTAL fused MRF: the whole 18-conv stage in one
            # Pallas kernel (ops/mrf_pallas.py) — one HBM read + one
            # write instead of ~36 per-conv activation passes. Same
            # param tree as the per-block modules, so checkpoints and
            # the torch importer are unaffected. Inference-only, and
            # currently SLOWER than the XLA path on v5e (see the
            # STATUS note in ops/mrf_pallas.py) — off by default.
            if (
                hp.get("vocoder_mrf_backend") == "pallas"
                and resblock is ResBlock1
                and x_in.shape[-1] % 128 == 0  # fill the MXU lanes; use
                # vocoder_time_fold to bring narrow tail stages to 128
                and not self.is_initializing()
            ):
                from bisinger_tpu.ops.mrf_pallas import fused_mrf_stage

                bank = [
                    _MRFBank(
                        channels=c_cur, kernel_size=ksz, dilations=dil,
                        name=f"res_{i}_{j}",
                    )()
                    for j, (ksz, dil) in enumerate(zip(rk, rd))
                ]
                x = fused_mrf_stage(
                    x_in, bank, rk, rd, fold,
                    compute_dtype=dtype,
                    # "roll" is the only mode that compiles in sane
                    # time on the tunneled toolchain (see STATUS note)
                    tap_mode=hp.get("vocoder_mrf_tap_mode", "roll"),
                    interpret=jax.default_backend() == "cpu",
                )
            else:
                mrf = 0.0
                for j, (ksz, dil) in enumerate(zip(rk, rd)):
                    if fold > 1:
                        block = FoldedResBlock1(
                            channels=c_cur, fold=fold, kernel_size=ksz,
                            dilations=dil, dtype=dtype, name=f"res_{i}_{j}",
                        )
                    else:
                        block = resblock(
                            channels=c_cur, kernel_size=ksz, dilations=dil,
                            dtype=dtype, name=f"res_{i}_{j}",
                        )
                    mrf = mrf + block(x_in)
                x = mrf / len(rk)
            if fold > 1:
                x = unfold_time(x, fold)
        x = nn.leaky_relu(x)
        x = nn.Conv(c_out, (7,), padding="SAME", kernel_init=conv_init,
                    name="conv_post")(x.astype(jnp.float32))
        x = jnp.tanh(x)
        return x[..., 0] if c_out == 1 else x


# --------------------------------------------------------------------------
# Discriminators (for vocoder training; reference `hifigan.py:185-329`)
# --------------------------------------------------------------------------
class DiscriminatorP(nn.Module):
    """Period discriminator: fold time by `period`, 2D convs over
    [T/period, period]."""

    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x):
        # x: [B, T] -> [B, T/p, p, 1]
        b, t = x.shape
        n_pad = (self.period - t % self.period) % self.period
        if n_pad:
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = x.reshape(b, t // self.period, self.period, 1)
        fmap = []
        channels = [32, 128, 512, 1024]
        for i, c in enumerate(channels):
            x = nn.Conv(
                c, (self.kernel_size, 1), strides=(self.stride, 1), padding=((2, 2), (0, 0)),
                name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = nn.Conv(1024, (self.kernel_size, 1), padding=((2, 2), (0, 0)), name="conv_4")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator: grouped 1D convs."""

    @nn.compact
    def __call__(self, x):
        x = x[:, :, None]  # [B, T, 1]
        fmap = []
        specs = [
            (128, 15, 1, 1),
            (128, 41, 2, 4),
            (256, 41, 2, 16),
            (512, 41, 4, 16),
            (1024, 41, 4, 16),
            (1024, 41, 1, 16),
            (1024, 5, 1, 1),
        ]
        for i, (c, k, s, g) in enumerate(specs):
            x = nn.Conv(
                c, (k,), strides=(s,), padding="SAME", feature_group_count=g,
                name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = nn.Conv(1, (3,), padding="SAME", name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(period=p, name=f"disc_{p}")
            o_r, f_r = d(y)
            o_g, f_g = d(y_hat)
            outs_r.append(o_r)
            outs_g.append(o_g)
            fmaps_r.append(f_r)
            fmaps_g.append(f_g)
        return outs_r, outs_g, fmaps_r, fmaps_g


class MultiScaleDiscriminator(nn.Module):
    num_scales: int = 3

    @nn.compact
    def __call__(self, y, y_hat):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for i in range(self.num_scales):
            if i > 0:
                y = nn.avg_pool(y[:, :, None], (4,), strides=(2,), padding="SAME")[:, :, 0]
                y_hat = nn.avg_pool(y_hat[:, :, None], (4,), strides=(2,), padding="SAME")[:, :, 0]
            d = DiscriminatorS(name=f"disc_{i}")
            o_r, f_r = d(y)
            o_g, f_g = d(y_hat)
            outs_r.append(o_r)
            outs_g.append(o_g)
            fmaps_r.append(f_r)
            fmaps_g.append(f_g)
        return outs_r, outs_g, fmaps_r, fmaps_g


# --------------------------------------------------------------------------
# GAN losses (reference `hifigan.py:332-369`)
# --------------------------------------------------------------------------
def feature_loss(fmap_r, fmap_g):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(disc_real, disc_gen):
    r_losses = sum(jnp.mean((1 - dr) ** 2) for dr in disc_real) / len(disc_real)
    g_losses = sum(jnp.mean(dg ** 2) for dg in disc_gen) / len(disc_gen)
    return r_losses, g_losses


def generator_loss(disc_outputs):
    return sum(jnp.mean((1 - dg) ** 2) for dg in disc_outputs) / len(disc_outputs)
