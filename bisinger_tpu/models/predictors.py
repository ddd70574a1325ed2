"""Duration / pitch / energy predictors and PE conv stacks (flax.linen).

Contracts from `train_bisinger/modules/fastspeech/tts_modules.py:61-241`
and `modules/fastspeech/pe.py`, in [B, T, C] layout. The conv-relu-LN
stacks are plain `nn.Conv` (XLA fuses the elementwise tail into the conv).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        # conv in self.dtype; the LayerNorm promotes back to fp32
        if self.padding == "SAME":
            x = nn.Conv(
                self.channels, (self.kernel_size,), padding="SAME",
                dtype=self.dtype,
            )(x)
        else:  # LEFT
            x = jnp.pad(x, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
            x = nn.Conv(
                self.channels, (self.kernel_size,), padding="VALID",
                dtype=self.dtype,
            )(x)
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
    dtype: Any = jnp.float32

    def setup(self):
        self.convs = [
            ConvReluLN(
                channels=self.n_chans,
                kernel_size=self.kernel_size,
                dropout=self.dropout,
                padding=self.padding,
                dtype=self.dtype,
                name=f"conv_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.linear = nn.Dense(self.odims, name="linear")
        if self.odims == 32:  # CRF: learned state-transition matrix
            self.crf_transitions = self.param(
                "crf_transitions", nn.initializers.zeros, (self.odims, self.odims)
            )

    def __call__(self, x, x_padding=None, deterministic=True):
        for conv in self.convs:
            x = conv(x, deterministic=deterministic)
            if x_padding is not None:
                x = x * (1.0 - x_padding.astype(x.dtype))[:, :, None]
        x = self.linear(x)
        if x_padding is not None:
            x = x * (1.0 - x_padding.astype(x.dtype))[:, :, None]
        if self.odims == 1:
            x = x[:, :, 0]  # [B, T] log-domain
        return x

    def out2dur(self, xs, padding=None):
        """Head output -> linear integer durations (reference
        `tts_modules.py:124-133`; the reference leaves MoG decode
        NotImplemented — here it decodes via the mixture expectation,
        and CRF via Viterbi with learned transitions). `padding` [B, T]
        (1 = pad) keeps the CRF decode independent of batch padding."""
        if self.odims == 1:
            return jnp.maximum(
                jnp.round(jnp.exp(xs) - self.offset), 0.0
            ).astype(jnp.int32)
        if self.odims == 15:  # MoG: 5 x (weight logit, mu, log_sigma)
            exp_log = mog_expected_log_dur(xs)
            return jnp.maximum(
                jnp.round(jnp.exp(exp_log) - self.offset), 0.0
            ).astype(jnp.int32)
        # CRF: states ARE frame counts; Viterbi over learned transitions
        mask = None if padding is None else 1.0 - padding.astype(jnp.float32)
        return crf_viterbi(xs, self.crf_transitions, mask=mask)


def crf_viterbi(emissions, transitions, mask=None):
    """Max-score state path of a linear-chain CRF (reference decodes via
    torchcrf, `tts_modules.py:132`). emissions [B, T, S] -> [B, T].

    With `mask` [B, T] (1 = valid, trailing padding), the recursion
    freezes past each row's last valid step and backpointers become the
    identity there, so the decoded path — and therefore the durations —
    do not depend on how much padding the batch bucket added."""
    S = emissions.shape[-1]

    def step(alpha, inp):
        em_t, m_t = inp
        # alpha [B, S]: best score ending in state s
        scores = alpha[:, :, None] + transitions[None]  # [B, S_prev, S]
        best_prev = jnp.argmax(scores, axis=1)  # [B, S]
        new_alpha = jnp.max(scores, axis=1) + em_t
        keep = m_t[:, None] > 0
        alpha = jnp.where(keep, new_alpha, alpha)
        ident = jnp.broadcast_to(
            jnp.arange(S, dtype=best_prev.dtype)[None], best_prev.shape
        )
        best_prev = jnp.where(keep, best_prev, ident)
        return alpha, best_prev

    em = jnp.swapaxes(emissions, 0, 1)  # [T, B, S]
    if mask is None:
        m = jnp.ones(em.shape[:2], jnp.float32)
    else:
        m = jnp.swapaxes(mask.astype(jnp.float32), 0, 1)  # [T, B]
    alpha, backptrs = jax.lax.scan(step, em[0], (em[1:], m[1:]))
    last = jnp.argmax(alpha, axis=-1)  # [B]

    def backtrack(state, bp_t):
        prev = jnp.take_along_axis(bp_t, state[:, None], axis=1)[:, 0]
        return prev, prev

    _, states = jax.lax.scan(backtrack, last, backptrs, reverse=True)
    return jnp.concatenate([jnp.swapaxes(states, 0, 1), last[:, None]], axis=1)


def crf_log_likelihood(emissions, transitions, tags, mask=None):
    """Linear-chain CRF log p(tags | emissions): score - logZ (forward
    algorithm). emissions [B, T, S], tags [B, T] int. Padding positions
    (mask 0) must be trailing."""
    B, T, S = emissions.shape
    if mask is None:
        mask = jnp.ones((B, T), jnp.float32)
    mask = mask.astype(jnp.float32)

    # path score
    em_score = jnp.take_along_axis(emissions, tags[..., None], axis=-1)[..., 0]
    em_score = (em_score * mask).sum(-1)
    tr = transitions[tags[:, :-1], tags[:, 1:]]
    tr_score = (tr * mask[:, 1:]).sum(-1)

    # partition via forward algorithm
    def step(alpha, inp):
        em_t, m_t = inp
        new = jax.nn.logsumexp(
            alpha[:, :, None] + transitions[None], axis=1
        ) + em_t
        return jnp.where(m_t[:, None] > 0, new, alpha), None

    em = jnp.swapaxes(emissions, 0, 1)
    mk = jnp.swapaxes(mask, 0, 1)
    alpha, _ = jax.lax.scan(step, em[0], (em[1:], mk[1:]))
    log_z = jax.nn.logsumexp(alpha, axis=-1)
    return em_score + tr_score - log_z


def mog_expected_log_dur(xs):
    """Differentiable mixture expectation over the log-duration domain
    (shared by out2dur decode and the training word/sentence terms so the
    two can never drift apart)."""
    w, mu, _ = jnp.split(xs, 3, axis=-1)
    return (jax.nn.softmax(w, axis=-1) * mu).sum(-1)


def mog_dur_nll(xs, dur_gt, offset: float = 1.0, mask=None):
    """Negative log-likelihood of log(dur + offset) under the 5-component
    Gaussian mixture head (odims 15: weight logits | means | log sigmas).
    xs [B, T, 15], dur_gt [B, T] float frames."""
    w, mu, log_sigma = jnp.split(xs, 3, axis=-1)
    log_sigma = jnp.clip(log_sigma, -7.0, 7.0)
    target = jnp.log(dur_gt + offset)[..., None]
    log_prob = (
        -0.5 * ((target - mu) / jnp.exp(log_sigma)) ** 2
        - log_sigma
        - 0.5 * math.log(2 * math.pi)
    )
    nll = -jax.nn.logsumexp(jax.nn.log_softmax(w, axis=-1) + log_prob, axis=-1)
    if mask is not None:
        m = mask.astype(nll.dtype)
        return (nll * m).sum() / jnp.maximum(m.sum(), 1.0)
    return nll.mean()


class PitchPredictor(nn.Module):
    """Sinusoidal positions + 5-layer conv stack -> linear
    (reference `tts_modules.py:194-237`). odim=2 -> [f0, uv] logits."""

    n_layers: int = 5
    n_chans: int = 384
    odim: int = 2
    kernel_size: int = 5
    dropout: float = 0.1
    padding: str = "SAME"
    dtype: Any = jnp.float32

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
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x, deterministic=deterministic)
        # head stays fp32 (ConvReluLN's LayerNorm already promoted back)
        return nn.Dense(self.odim, name="linear")(x)


class EnergyPredictor(PitchPredictor):
    pass


class Prenet(nn.Module):
    """PE mel prenet: 3x (conv k=5 -> relu -> BatchNorm), masked
    (reference `modules/fastspeech/pe.py:8-42`). Real BatchNorm matching
    the reference (`pe.py:18`): eval uses running stats (weight-transfer
    parity with torch checkpoints); train updates the `batch_stats`
    collection. Under jit+sharding the batch statistics are global — XLA
    inserts the cross-device reduction, no axis_name needed."""

    out_dim: int = 256
    kernel: int = 5
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        padding_mask = jnp.abs(x).sum(-1) == 0
        nonpad = 1.0 - padding_mask.astype(x.dtype)[:, :, None]
        for i in range(self.n_layers):
            x = nn.Conv(
                self.out_dim, (self.kernel,), padding="SAME", dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            x = jax.nn.relu(x)
            # torch BatchNorm1d defaults: momentum 0.1 (flax convention:
            # running = m*running + (1-m)*new -> 0.9), eps 1e-5
            x = nn.BatchNorm(
                use_running_average=deterministic,
                momentum=0.9,
                epsilon=1e-5,
                name=f"norm_{i}",
            )(x)
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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(
            self.n_chans, kernel_init=xavier_uniform, dtype=self.dtype,
            name="in_proj",
        )(x)
        for i in range(self.n_layers):
            y = nn.Conv(
                self.n_chans, (self.kernel_size,), padding="SAME",
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            y = nn.GroupNorm(num_groups=self.n_chans // 16, name=f"norm_{i}")(y)
            y = jax.nn.relu(y)
            x = x + y if self.res else y
        return nn.Dense(self.odim, kernel_init=xavier_uniform, name="out_proj")(x)
