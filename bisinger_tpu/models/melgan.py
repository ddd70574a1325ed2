"""MelGAN generator + multi-scale discriminator.

Counterpart of the reference's vendored MelGAN
(`modules/parallel_wavegan/models/melgan.py`, 426 LoC): mel [B, T, 80]
-> wav via conv_pre, transposed-conv upsample stages, 3 dilated residual
stacks per stage, tanh output; the discriminator pools the signal over
scales and applies strided grouped convs.

TPU notes: channels-last [B, T, C] throughout so every conv lowers to an
MXU matmul over the feature axis; ConvTranspose strides map to
lax.conv_transpose; reflection padding folded into SAME padding (XLA has
no cheap reflect-pad fusion and the receptive-field difference is
inaudible at the edges).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bisinger_tpu.config import HParams

LRELU_SLOPE = 0.2


class ResidualStack(nn.Module):
    """3 dilated conv blocks with 1x1 skip (reference melgan.py
    ResidualStack)."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 9)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            y = nn.leaky_relu(x, LRELU_SLOPE)
            # reference pads with ReflectionPad1d before the dilated
            # conv (`layers/residual_stack.py:48`) — zero padding would
            # differ at utterance boundaries
            p = (self.kernel_size - 1) // 2 * d
            y = jnp.pad(y, ((0, 0), (p, p), (0, 0)), mode="reflect")
            y = nn.Conv(
                self.channels,
                (self.kernel_size,),
                kernel_dilation=d,
                padding="VALID",
                name=f"conv_{i}",
            )(y)
            y = nn.leaky_relu(y, LRELU_SLOPE)
            y = nn.Conv(self.channels, (1,), name=f"out_{i}")(y)
            s = nn.Conv(self.channels, (1,), name=f"skip_{i}")(x)
            x = y + s
        return x


class MelGanGenerator(nn.Module):
    """mel [B, T, M] -> wav [B, T * prod(upsample_scales)]."""

    hp: HParams
    in_channels: int = 80

    @nn.compact
    def __call__(self, mel):
        hp = self.hp
        scales: Sequence[int] = hp.get("melgan_upsample_scales", [8, 8, 2, 2])
        c = hp.get("melgan_channels", 512)
        # reflection padding like the reference's ReflectionPad1d
        # (`models/melgan.py:45-47,124`)
        xp = jnp.pad(mel, ((0, 0), (3, 3), (0, 0)), mode="reflect")
        x = nn.Conv(c, (7,), padding="VALID", name="conv_pre")(xp)
        for i, s in enumerate(scales):
            c //= 2
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = nn.ConvTranspose(
                c,
                (s * 2,),
                strides=(s,),
                padding="SAME",
                name=f"up_{i}",
            )(x)
            x = ResidualStack(channels=c, name=f"res_{i}")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        x = jnp.pad(x, ((0, 0), (3, 3), (0, 0)), mode="reflect")
        x = nn.Conv(1, (7,), padding="VALID", name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class MelGanDiscriminator(nn.Module):
    """One scale: strided (grouped) conv stack -> logits + feature maps."""

    @nn.compact
    def __call__(self, wav):
        x = wav[..., None]  # [B, T, 1]
        feats = []
        x = nn.Conv(16, (15,), padding="SAME", name="conv0")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        feats.append(x)
        ch = 16
        for i in range(4):
            in_ch = ch
            ch = min(ch * 4, 1024)
            x = nn.Conv(
                ch,
                (41,),
                strides=(4,),
                padding="SAME",
                # reference: groups = in_channels // 4
                # (`models/melgan.py:256`)
                feature_group_count=max(1, in_ch // 4),
                name=f"conv{i + 1}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            feats.append(x)
        x = nn.Conv(ch, (5,), padding="SAME", name="conv5")(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        feats.append(x)
        x = nn.Conv(1, (3,), padding="SAME", name="conv_out")(x)
        return x[..., 0], feats


class MelGanMultiScaleDiscriminator(nn.Module):
    """3 scales with avg-pool downsampling between them (reference
    melgan.py MelGANMultiScaleDiscriminator)."""

    scales: int = 3

    @nn.compact
    def __call__(self, wav):
        outs = []
        x = wav
        for i in range(self.scales):
            outs.append(MelGanDiscriminator(name=f"disc_{i}")(x))
            if i < self.scales - 1:
                x = nn.avg_pool(
                    x[..., None], window_shape=(4,), strides=(2,), padding="SAME"
                )[..., 0]
        return outs
