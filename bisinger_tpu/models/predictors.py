"""Duration / pitch / energy predictors and PE conv stacks (flax.linen).

Contracts from `train_bisinger/modules/fastspeech/tts_modules.py:61-241`
and `modules/fastspeech/pe.py`, in [B, T, C] layout. The conv-relu-LN
stacks are plain `nn.Conv` (XLA fuses the elementwise tail into the conv).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from bisinger_tpu.models.common import sinusoidal_positions, xavier_uniform


class ConvReluLN(nn.Module):
    """One predictor layer: ConstantPad+Conv -> ReLU -> LayerNorm(channel)
    -> dropout (reference `DurationPredictor.__init__`,
    `tts_modules.py:87-97`). LayerNorm eps follows the reference's espnet
    LayerNorm (1e-12)."""

    channels: int
    kernel_size: int
    dropout: float
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, deterministic=True):
        if self.padding == "SAME":
            x = nn.Conv(self.channels, (self.kernel_size,), padding="SAME")(x)
        else:  # LEFT
            x = jnp.pad(x, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
            x = nn.Conv(self.channels, (self.kernel_size,), padding="VALID")(x)
        x = jax.nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-12)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class DurationPredictor(nn.Module):
    """Conv stack -> linear -> log-domain durations
    (reference `tts_modules.py:61-153`). Returns [B, T] log durations
    (MSE path); `out2dur` converts to integer frame counts."""

    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    dropout: float = 0.5
    offset: float = 1.0
    padding: str = "SAME"
    odims: int = 1

    @nn.compact
    def __call__(self, x, x_padding=None, deterministic=True):
        for i in range(self.n_layers):
            x = ConvReluLN(
                channels=self.n_chans,
                kernel_size=self.kernel_size,
                dropout=self.dropout,
                padding=self.padding,
                name=f"conv_{i}",
            )(x, deterministic=deterministic)
            if x_padding is not None:
                x = x * (1.0 - x_padding.astype(x.dtype))[:, :, None]
        x = nn.Dense(self.odims, name="linear")(x)
        if x_padding is not None:
            x = x * (1.0 - x_padding.astype(x.dtype))[:, :, None]
        if self.odims == 1:
            x = x[:, :, 0]  # [B, T] log-domain
        return x

    def out2dur(self, xs):
        """log-domain -> linear integer durations: round(exp(x) - offset),
        clipped at 0 (reference `tts_modules.py:124-133`)."""
        return jnp.maximum(jnp.round(jnp.exp(xs) - self.offset), 0.0).astype(jnp.int32)


class PitchPredictor(nn.Module):
    """Sinusoidal positions + 5-layer conv stack -> linear
    (reference `tts_modules.py:194-237`). odim=2 -> [f0, uv] logits."""

    n_layers: int = 5
    n_chans: int = 384
    odim: int = 2
    kernel_size: int = 5
    dropout: float = 0.1
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, deterministic=True):
        alpha = self.param("pos_embed_alpha", nn.initializers.ones, (1,))
        nonpad = (jnp.abs(x).sum(-1) != 0).astype(jnp.int32)
        x = x + alpha * sinusoidal_positions(nonpad, x.shape[-1])
        for i in range(self.n_layers):
            x = ConvReluLN(
                channels=self.n_chans,
                kernel_size=self.kernel_size,
                dropout=self.dropout,
                padding=self.padding,
                name=f"conv_{i}",
            )(x, deterministic=deterministic)
        return nn.Dense(self.odim, name="linear")(x)


class EnergyPredictor(PitchPredictor):
    pass


class Prenet(nn.Module):
    """PE mel prenet: 3x (conv k=5 -> relu -> BatchNorm), masked
    (reference `modules/fastspeech/pe.py:8-42`). BatchNorm uses running
    stats only in eval; here we use LayerNorm over channels (same
    normalization role, SPMD-friendly — batch statistics would need
    cross-device sync)."""

    out_dim: int = 256
    kernel: int = 5
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, deterministic=True):
        padding_mask = jnp.abs(x).sum(-1) == 0
        nonpad = 1.0 - padding_mask.astype(x.dtype)[:, :, None]
        for i in range(self.n_layers):
            x = nn.Conv(self.out_dim, (self.kernel,), padding="SAME", name=f"conv_{i}")(x)
            x = jax.nn.relu(x)
            x = nn.LayerNorm(name=f"norm_{i}")(x)
            x = x * nonpad
        x = nn.Dense(self.out_dim, name="out_proj")(x)
        return x * nonpad


class ConvStacks(nn.Module):
    """Residual conv stack with GroupNorm
    (reference `pe.py:82-117`)."""

    n_layers: int = 5
    n_chans: int = 256
    odim: int = 256
    kernel_size: int = 5
    res: bool = True

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.n_chans, kernel_init=xavier_uniform, name="in_proj")(x)
        for i in range(self.n_layers):
            y = nn.Conv(self.n_chans, (self.kernel_size,), padding="SAME", name=f"conv_{i}")(x)
            y = nn.GroupNorm(num_groups=self.n_chans // 16, name=f"norm_{i}")(y)
            y = jax.nn.relu(y)
            x = x + y if self.res else y
        return nn.Dense(self.odim, kernel_init=xavier_uniform, name="out_proj")(x)
