"""Shared NN primitives (flax.linen), [B, T, C] layout throughout.

Re-creates the behavioural contracts of the reference primitives
(`train_bisinger/modules/commons/common_layers.py`) with TPU-idiomatic
code: batch-major layout (the reference's T×B×C is a fairseq artifact),
`nn.Dense`/`nn.Conv` with matching initializers, and sinusoidal tables
built as constants at trace time (XLA folds them).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

xavier_uniform = nn.initializers.xavier_uniform()
zeros_init = nn.initializers.zeros


def compute_dtype(hp) -> Any:
    """Activation dtype from hparams (`compute_dtype: bfloat16|float32`).

    Mixed-precision contract (SURVEY §7.3: train bf16 with fp32
    accumulations): params, optimizer state, losses and module *outputs*
    stay fp32; only the activations inside the heavy stacks (attention,
    conv-FFN, predictor convs) run in bf16. MXU matmuls accumulate fp32
    regardless; softmax/LayerNorm/BatchNorm/GroupNorm statistics are
    computed in fp32 explicitly."""
    return jnp.bfloat16 if hp.get("compute_dtype") == "bfloat16" else jnp.float32


class Embedding(nn.Module):
    """Token embedding, init normal(std=dim^-0.5), padding_idx row forced to
    zero at lookup (reference `common_layers.py:79-85`)."""

    num_embeddings: int
    features: int
    padding_idx: Optional[int] = None

    @nn.compact
    def __call__(self, ids):
        emb = nn.Embed(
            self.num_embeddings,
            self.features,
            embedding_init=nn.initializers.normal(stddev=self.features ** -0.5),
            name="embed",
        )(ids)
        if self.padding_idx is not None:
            emb = jnp.where((ids != self.padding_idx)[..., None], emb, 0.0)
        return emb


def sinusoidal_table(num_positions: int, dim: int, padding_idx: Optional[int] = 0) -> np.ndarray:
    """Fairseq/tensor2tensor sinusoidal embedding table
    (reference `common_layers.py:125-146`): [sin | cos] concatenated, not
    interleaved; row `padding_idx` zeroed."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64) * -(math.log(10000) / (half - 1)))
    pos = np.arange(num_positions, dtype=np.float64)[:, None] * freq[None, :]
    table = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_positions, 1))], axis=1)
    if padding_idx is not None:
        table[padding_idx, :] = 0
    return table.astype(np.float32)


def sinusoidal_positions(nonpad_mask, dim: int, padding_idx: int = 0):
    """Per-token sinusoidal position embeddings [B, T, dim] from a
    nonpadding mask [B, T] (position ids = cumsum over nonpad, padding rows
    get the zeroed `padding_idx` row) — the
    `SinusoidalPositionalEmbedding` + `make_positions` pair."""
    t = nonpad_mask.shape[1]
    table = jnp.asarray(sinusoidal_table(t + padding_idx + 1, dim, padding_idx))
    mask = nonpad_mask.astype(jnp.int32)
    positions = jnp.cumsum(mask, axis=1) * mask + padding_idx
    return jnp.take(table, positions, axis=0)


def rel_positional_encoding(t: int, dim: int, max_len: int = 5000) -> jnp.ndarray:
    """ESPnet legacy RelPositionalEncoding table slice [1, t, dim]
    (reference `espnet_positional_embedding.py:91-113`): interleaved
    sin/cos over *reversed* positions (max_len-1 .. 0), sliced to t."""
    max_len = max(max_len, t)
    position = np.arange(max_len - 1, -1, -1.0, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64) * -(math.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return jnp.asarray(pe[None, :t], dtype=jnp.float32)


class LayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis, torch eps default."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps)(x)


class MultiHeadAttention(nn.Module):
    """Dot-product MHA matching the reference fairseq-style module
    (`common_layers.py:199-576`): optional qkv/out bias, scaling q by
    head_dim^-0.5, key padding mask. [B, T, C] layout; one fused qkv
    projection keeps the matmuls MXU-sized."""

    num_heads: int
    bias: bool = True
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None, deterministic=True):
        d = query.shape[-1]
        h = self.num_heads
        head_dim = d // h
        proj = lambda name: nn.Dense(
            d, use_bias=self.bias, kernel_init=xavier_uniform, dtype=self.dtype,
            name=name,
        )
        q = proj("q_proj")(query) * head_dim ** -0.5
        k = proj("k_proj")(key)
        v = proj("v_proj")(value)

        def split(x):
            return x.reshape(x.shape[0], x.shape[1], h, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)  # [B, h, T, hd]
        # logits accumulate in fp32 so the softmax is numerically fp32
        # even when q/k are bf16 (MXU accumulates fp32 either way)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        if key_padding_mask is not None:
            neg = jnp.finfo(logits.dtype).min
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        if self.dropout > 0.0 and not deterministic:
            weights = nn.Dropout(self.dropout)(weights, deterministic=False)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(query.shape[0], query.shape[1], d)
        return nn.Dense(
            d, use_bias=self.bias, kernel_init=xavier_uniform, dtype=self.dtype,
            name="out_proj",
        )(out)


class TransformerFFN(nn.Module):
    """Conv(k)->act->Dense FFN (reference `TransformerFFNLayer`,
    `common_layers.py:598-644`), including the k^-0.5 post-conv scaling."""

    hidden_size: int
    filter_size: int
    kernel_size: int = 9
    padding: str = "SAME"
    dropout: float = 0.0
    act: str = "gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        if self.padding == "SAME":
            x = nn.Conv(
                self.filter_size, (self.kernel_size,), padding="SAME",
                dtype=self.dtype,
            )(x)
        else:  # LEFT / causal
            x = jnp.pad(x, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
            x = nn.Conv(
                self.filter_size, (self.kernel_size,), padding="VALID",
                dtype=self.dtype,
            )(x)
        x = x * self.kernel_size ** -0.5
        if self.act == "gelu":
            x = jax.nn.gelu(x)
        elif self.act == "relu":
            x = jax.nn.relu(x)
        elif self.act == "swish":
            x = jax.nn.silu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden_size, kernel_init=xavier_uniform, dtype=self.dtype)(x)
        return x


class EncSALayer(nn.Module):
    """Pre-norm self-attention + conv-FFN block
    (reference `common_layers.py:664-730`). Residuals re-masked after each
    sub-block."""

    hidden_size: int
    num_heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.0
    relu_dropout: float = 0.1
    kernel_size: int = 9
    padding: str = "SAME"
    act: str = "gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        # LayerNorms compute in fp32 (params are fp32, flax promotes); the
        # MHA/FFN input projections cast back down to self.dtype.
        nonpad = 1.0 - padding_mask.astype(x.dtype)[:, :, None]
        if self.num_heads > 0:
            residual = x
            y = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
            y = MultiHeadAttention(
                num_heads=self.num_heads,
                bias=False,
                dropout=self.attention_dropout,
                dtype=self.dtype,
                name="self_attn",
            )(y, y, y, key_padding_mask=padding_mask, deterministic=deterministic)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            x = (residual + y) * nonpad
        residual = x
        y = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        y = TransformerFFN(
            hidden_size=self.hidden_size,
            filter_size=4 * self.hidden_size,
            kernel_size=self.kernel_size,
            padding=self.padding,
            dropout=self.relu_dropout,
            act=self.act,
            dtype=self.dtype,
            name="ffn",
        )(y, deterministic=deterministic)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        x = (residual + y) * nonpad
        return x


class ESM(nn.Module):
    """Embedding Skip Module — the BiSinger novelty
    (reference `common_layers.py:832-860`): fuses the language-embedding
    sequence LP with token embeddings Eo via cross-attention.

        Mo = MHA(q=Eo, k=v=LN1(LP)) + LP
        Fo = FFN(LN2(Mo)) + Mo

    Attention axis: the reference feeds [B, T, H] tensors into
    `torch.nn.MultiheadAttention` with the default `batch_first=False`
    (`common_layers.py:853`), so dim 0 (= the BATCH axis) is treated as
    the sequence — attention mixes the B utterances at each token index,
    not the T tokens of one utterance. `cross_batch=True` (default)
    reproduces that exact behaviour for checkpoint/numerical parity;
    set hp `esm_cross_batch: false` for the per-utterance (over-time)
    variant, which is batch-order invariant and the sane choice for new
    training runs."""

    hidden_size: int
    num_heads: int = 8
    cross_batch: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, eo, lp, deterministic=True):
        lp_norm = nn.LayerNorm(epsilon=1e-5, name="ln1")(lp)
        mh = MultiHeadAttention(
            num_heads=self.num_heads, bias=True, dtype=self.dtype, name="mh"
        )
        if self.cross_batch:
            # reference semantics: attend over axis 0. Our MHA attends
            # over axis 1, so swap (B, T) -> (T, B), attend, swap back.
            mo = mh(
                eo.swapaxes(0, 1),
                lp_norm.swapaxes(0, 1),
                lp_norm.swapaxes(0, 1),
                deterministic=deterministic,
            ).swapaxes(0, 1)
        else:
            mo = mh(eo, lp_norm, lp_norm, deterministic=deterministic)
        mo = mo + lp
        y = nn.LayerNorm(epsilon=1e-5, name="ln2")(mo)
        y = nn.Dense(
            self.hidden_size, kernel_init=xavier_uniform, dtype=self.dtype,
            name="ffn1",
        )(y)
        y = jax.nn.relu(y)
        y = nn.Dense(
            self.hidden_size, kernel_init=xavier_uniform, dtype=self.dtype,
            name="ffn2",
        )(y)
        return y + mo


class FFTBlocks(nn.Module):
    """Stack of EncSALayer with optional sinusoidal positions and final LN
    (reference `modules/fastspeech/tts_modules.py:253-309`)."""

    hidden_size: int
    num_layers: int
    ffn_kernel_size: int = 9
    dropout: float = 0.1
    num_heads: int = 2
    use_pos_embed: bool = True
    use_last_norm: bool = True
    padding: str = "SAME"
    act: str = "gelu"
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic=True):
        if padding_mask is None:
            padding_mask = jnp.abs(x).sum(-1) == 0
        # activations run in self.dtype inside the stack; the output is
        # cast back to fp32 so callers (heads, losses) stay full precision
        out_dtype = x.dtype
        x = x.astype(self.dtype)
        nonpad = 1.0 - padding_mask.astype(x.dtype)[:, :, None]
        if self.use_pos_embed:
            alpha = self.param("pos_embed_alpha", nn.initializers.ones, (1,))
            positions = alpha * sinusoidal_positions(
                1 - padding_mask.astype(jnp.int32), self.hidden_size
            )
            x = x + positions.astype(self.dtype)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = x * nonpad
        block = EncSALayer
        if self.remat:
            block = nn.remat(EncSALayer, static_argnums=(3,))
        for i in range(self.num_layers):
            x = block(
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                dropout=self.dropout,
                attention_dropout=0.0,
                relu_dropout=self.dropout,
                kernel_size=self.ffn_kernel_size,
                padding=self.padding,
                act=self.act,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, padding_mask, deterministic) * nonpad
        if self.use_last_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="final_ln")(x) * nonpad
        return x.astype(out_dtype)
