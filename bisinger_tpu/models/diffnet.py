"""DiffNet denoiser — non-causal WaveNet for mel refinement (flax.linen).

Behavioural port of `train_bisinger/usr/diff/net.py:58-130`:
  in-proj Conv1x1(80->C) -> relu -> N residual blocks (dilated conv k=3,
  dilation 2^(i % cycle), gated tanh*sigmoid, conditioner 1x1 from the fs2
  decoder input, per-block diffusion-step bias) -> skip-sum/sqrt(N) ->
  Conv1x1 -> relu -> Conv1x1(C->80, zero-init).

Layout: [B, T, C] (channels-last; the reference is [B, C, T]). The gated
dilated conv + conditioner-add + split is left to XLA fusion; a fused
Pallas kernel for the residual block lives in
`bisinger_tpu.ops.pallas.diffnet_block` (used when it wins on benchmark).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from bisinger_tpu.config import HParams


def diffusion_step_embedding(t, dim: int):
    """Sinusoidal embedding of the diffusion step (reference
    `net.py:32-44`): [sin | cos] over half-dim with log-spaced freqs."""
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def kaiming_normal_conv():
    # torch nn.init.kaiming_normal_ default: fan_in, relu gain
    return nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class ResidualBlock(nn.Module):
    """Gated dilated-conv residual block (reference `net.py:58-78`)."""

    residual_channels: int
    dilation: int

    @nn.compact
    def __call__(self, x, conditioner, diffusion_step):
        c = self.residual_channels
        step = nn.Dense(c, name="diffusion_projection")(diffusion_step)  # [B, C]
        y = x + step[:, None, :]
        y = nn.Conv(
            2 * c,
            (3,),
            kernel_dilation=self.dilation,
            padding="SAME",
            kernel_init=kaiming_normal_conv(),
            name="dilated_conv",
        )(y)
        cond = nn.Conv(
            2 * c, (1,), kernel_init=kaiming_normal_conv(), name="conditioner_projection"
        )(conditioner)
        y = y + cond
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = nn.Conv(
            2 * c, (1,), kernel_init=kaiming_normal_conv(), name="output_projection"
        )(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


class DiffNet(nn.Module):
    """x_noisy [B, T, M], t [B], cond [B, T, H] -> predicted noise
    [B, T, M]."""

    hp: HParams
    in_dims: int = 80

    @nn.compact
    def __call__(self, spec, diffusion_step, cond):
        hp = self.hp
        c = hp["residual_channels"]
        n_layers = hp["residual_layers"]
        cycle = hp["dilation_cycle_length"]

        x = nn.Conv(c, (1,), kernel_init=kaiming_normal_conv(), name="input_projection")(spec)
        x = jax.nn.relu(x)
        step = diffusion_step_embedding(diffusion_step, c)
        step = nn.Dense(c * 4, name="mlp_0")(step)
        step = step * jnp.tanh(jax.nn.softplus(step))  # Mish
        step = nn.Dense(c, name="mlp_1")(step)

        skip_sum = 0.0
        for i in range(n_layers):
            x, skip = ResidualBlock(
                residual_channels=c, dilation=2 ** (i % cycle), name=f"res_{i}"
            )(x, cond, step)
            skip_sum = skip_sum + skip
        x = skip_sum / math.sqrt(n_layers)
        x = nn.Conv(c, (1,), kernel_init=kaiming_normal_conv(), name="skip_projection")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(
            self.in_dims, (1,), kernel_init=nn.initializers.zeros, name="output_projection"
        )(x)
        return x
