"""Fused Pallas TPU kernel for the DiffNet residual stack.

The diffusion sampler calls the DiffNet denoiser 200-1000 times per
utterance (PLMS/DDPM NFE). In the XLA path every residual layer round-
trips its [B, T, 2C] activations through HBM between the dilated conv,
the gate, and the 1x1 output projection — ~5 tensors x 20 layers per
NFE of pure HBM traffic. This kernel keeps the running hidden state `x`
resident in VMEM across all layers (double-buffered, zero-padded halo
for the dilated taps) and streams only the per-layer weights and the
precomputed conditioner projections from HBM, so each NFE reads each
weight once and never spills activations.

Matches `bisinger_tpu.models.diffnet.DiffNet` (reference DiffNet,
`usr/diff/net.py:81-130`) numerically: dilated taps at t-d, t, t+d with
SAME zero padding applied to (x + step_emb), sigmoid(first half) *
tanh(second half) gating, (x + residual)/sqrt(2) carry, skip sum.

Layout notes (pallas_guide.md): C=256 keeps every matmul lane-aligned;
the flattened [B*Tc, C] GEMMs are MXU-shaped; weights are fed bf16 with
fp32 accumulation (preferred_element_type). Mosaic requires sublane-dim
loads at 8-aligned offsets, so each grid step loads ONE aligned
halo window of the hidden state and takes the +-d taps as *static*
slices inside a `lax.switch` over the (static) unique dilations.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RSQRT2 = 1.0 / math.sqrt(2.0)


def _stack_kernel(
    # refs streamed per (batch-block, layer, t-chunk) grid step
    dsel_ref,  # [L, 1] int32 in SMEM: index into `uniq_dils` per layer
    step_ref,  # [1, Bb, 1, C] per-layer step embedding (already projected;
    # the singleton keeps the batch dim out of the lane/sublane positions
    # so Bb need not be 8-aligned)
    wd_ref,  # [1, 3, C, 2C] dilated conv weight
    bd_ref,  # [1, 1, 2C] dilated conv bias
    wo_ref,  # [1, C, 2C] output projection weight
    bo_ref,  # [1, 1, 2C] output projection bias
    cond_ref,  # [1, Bb, Tc, 2C] conditioner projection chunk
    x0_ref,  # [Bb, Tc, C] initial hidden state chunk (streamed)
    skip_ref,  # out: [Bb, Tc, C] skip chunk (mirror of skip_acc)
    xbuf,  # scratch: [2, Bb, T + 2H, C] double-buffered padded hidden
    skip_acc,  # scratch: [Bb, T, C] fp32 running skip sum
    *,
    T: int,
    Tc: int,
    H: int,
    C: int,
    uniq_dils: Sequence[int],
):
    # grid = (n_b, L + 1, n_t): the batch axis is OUTERMOST so the
    # hidden state of one batch block stays VMEM-resident through all
    # layers; scratch is reused (re-initialised) per block. Layer step 0
    # is a pure COPY pass: all chunks land in xbuf[0] before any conv
    # reads a halo (a chunk's right halo belongs to the next chunk, so
    # compute can't start at layer 0's first visit). Layers are computed
    # at l = 1..L with lm = l - 1.
    b = pl.program_id(0)
    l = pl.program_id(1)
    t = pl.program_id(2)
    B = x0_ref.shape[0]
    t0 = t * Tc

    @pl.when((b == 0) & (l == 0) & (t == 0))
    def _():
        # one-time zero of the halo padding; the interior is overwritten
        # by the copy pass of every batch block, the padding never is
        xbuf[...] = jnp.zeros(xbuf.shape, xbuf.dtype)

    @pl.when(l == 0)
    def _():
        xbuf[0, :, pl.ds(H + t0, Tc), :] = x0_ref[...]
        skip_acc[:, pl.ds(t0, Tc), :] = jnp.zeros((B, Tc, C), skip_acc.dtype)

    lm = jnp.maximum(l - 1, 0)
    src = jax.lax.rem(lm, 2)
    dst = jax.lax.rem(lm + 1, 2)

    step = step_ref[0, :, 0, :].astype(jnp.float32)  # [B, C]

    @pl.when(l > 0)
    def _compute():
        # one ALIGNED halo window per step: rows [t0, t0 + Tc + 2H) of
        # the padded buffer == global frames [t0 - H, t0 + Tc + H).
        # Window/taps stay bf16 (the flax bf16 path also adds x + step in
        # bf16); accumulation is fp32 via preferred_element_type.
        win = xbuf[src, :, pl.ds(t0, Tc + 2 * H), :]
        xm = jax.lax.slice_in_dim(win, H, H + Tc, axis=1)  # [B, Tc, C]
        step_b = step.astype(jnp.bfloat16)

        wd = wd_ref[0]  # [3, C, 2C]

        def conv_for(d: int):
            """Dilated conv with STATIC shift d (zero-padded halo handles
            interior chunks; mask the step add outside the sequence)."""

            def tap(shift: int):
                xs = jax.lax.slice_in_dim(win, H + shift, H + shift + Tc, axis=1)
                gidx = t0 + shift + jax.lax.broadcasted_iota(jnp.int32, (1, Tc, 1), 1)
                valid = (gidx >= 0) & (gidx < T)
                return jnp.where(
                    valid, xs + step_b[:, None, :], jnp.bfloat16(0.0)
                )

            y = jnp.dot(
                tap(-d).reshape(B * Tc, C),
                wd[0],
                preferred_element_type=jnp.float32,
            )
            y += jnp.dot(
                tap(0).reshape(B * Tc, C),
                wd[1],
                preferred_element_type=jnp.float32,
            )
            y += jnp.dot(
                tap(d).reshape(B * Tc, C),
                wd[2],
                preferred_element_type=jnp.float32,
            )
            return y.reshape(B, Tc, 2 * C)

        if len(uniq_dils) == 1:
            y = conv_for(uniq_dils[0])
        else:
            y = jax.lax.switch(
                dsel_ref[lm, 0], [functools.partial(conv_for, d) for d in uniq_dils]
            )
        y = y + bd_ref[0][None] + cond_ref[0].astype(jnp.float32)

        gate = jax.nn.sigmoid(y[..., :C])
        filt = jnp.tanh(y[..., C:])
        g = (gate * filt).astype(jnp.bfloat16)

        z = jnp.dot(
            g.reshape(B * Tc, C), wo_ref[0].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).reshape(B, Tc, 2 * C) + bo_ref[0][None]

        x_new = (xm + z[..., :C]) * _RSQRT2
        xbuf[dst, :, pl.ds(H + t0, Tc), :] = x_new.astype(xbuf.dtype)
        skip_acc[:, pl.ds(t0, Tc), :] += z[..., C:]

    # output blocks are revisited NON-consecutively across the layer dim,
    # which Pallas TPU does not guarantee to preserve — so the running sum
    # lives in VMEM scratch and the current block state is (re)written to
    # the output every visit; the final (l == L) visit writes the
    # completed sum, which is what lands in HBM last.
    skip_ref[...] = skip_acc[:, pl.ds(t0, Tc), :]


def pick_batch_chunk(
    B: int, T: int, C: int, H: int, budget_bytes: int
) -> int:
    """Largest divisor Bb of B whose VMEM scratch (double-buffered bf16
    hidden + fp32 skip accumulator) fits `budget_bytes`; 0 if none."""
    cost_per_b = 2 * (T + 2 * H) * C * 2 + T * C * 4
    for bb in sorted((d for d in range(1, B + 1) if B % d == 0), reverse=True):
        if bb * cost_per_b <= budget_bytes:
            return bb
    return 0


def fused_residual_stack(
    x0: jax.Array,  # [B, T, C] fp32/bf16 — after input_projection+relu
    cond_proj: jax.Array,  # [L, B, T, 2C]
    step_proj: jax.Array,  # [L, B, C] — per-layer projected step embedding
    wd: jax.Array,  # [L, 3, C, 2C]
    bd: jax.Array,  # [L, 2C]
    wo: jax.Array,  # [L, C, 2C]
    bo: jax.Array,  # [L, 2C]
    dilations: Sequence[int],
    *,
    t_chunk: int = 128,
    b_chunk: int = 0,  # 0 = auto (largest divisor of B fitting VMEM)
    vmem_budget: int = 48 * 1024 * 1024,
    interpret: bool = False,
) -> jax.Array:
    """-> skip_sum [B, T, C] fp32 (caller divides by sqrt(L))."""
    B, T, C = x0.shape
    L = len(dilations)
    Tc = min(t_chunk, T)
    while T % Tc != 0:  # largest chunk <= t_chunk that tiles T exactly
        Tc //= 2
    assert Tc >= 8, (T, Tc)
    uniq_dils = sorted(set(int(d) for d in dilations))
    # halo must be 8-aligned so window starts stay aligned
    H = max((max(uniq_dils) + 7) // 8 * 8, 8)
    n_t = T // Tc
    Bb = b_chunk or pick_batch_chunk(B, T, C, H, vmem_budget)
    assert Bb and B % Bb == 0, (B, T, C, Bb)
    n_b = B // Bb

    dsel = jnp.asarray(
        [uniq_dils.index(int(d)) for d in dilations], jnp.int32
    ).reshape(L, 1)

    def lidx(l):
        # layer-stream index: grid step l computes layer l-1 (step 0 is
        # the copy pass); clamp keeps the map valid at l == 0
        return jnp.maximum(l - 1, 0)

    grid = (n_b, L + 1, n_t)
    out = pl.pallas_call(
        functools.partial(
            _stack_kernel, T=T, Tc=Tc, H=H, C=C, uniq_dils=uniq_dils
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 1), lambda b, l, t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Bb, 1, C), lambda b, l, t: (lidx(l), b, 0, 0)),
            pl.BlockSpec((1, 3, C, 2 * C), lambda b, l, t: (lidx(l), 0, 0, 0)),
            pl.BlockSpec((1, 1, 2 * C), lambda b, l, t: (lidx(l), 0, 0)),
            pl.BlockSpec((1, C, 2 * C), lambda b, l, t: (lidx(l), 0, 0)),
            pl.BlockSpec((1, 1, 2 * C), lambda b, l, t: (lidx(l), 0, 0)),
            pl.BlockSpec((1, Bb, Tc, 2 * C), lambda b, l, t: (lidx(l), b, t, 0)),
            pl.BlockSpec((Bb, Tc, C), lambda b, l, t: (b, t, 0)),
        ],
        out_specs=pl.BlockSpec((Bb, Tc, C), lambda b, l, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, Bb, T + 2 * H, C), jnp.bfloat16),
            pltpu.VMEM((Bb, T, C), jnp.float32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        dsel,
        step_proj[:, :, None, :].astype(jnp.bfloat16),
        wd.astype(jnp.bfloat16),
        bd.reshape(L, 1, 2 * C).astype(jnp.float32),
        wo.astype(jnp.bfloat16),
        bo.reshape(L, 1, 2 * C).astype(jnp.float32),
        cond_proj.astype(jnp.bfloat16),
        x0.astype(jnp.bfloat16),
    )
    return out


def diffnet_forward_pallas(params, hp, spec, t, cond_proj, *, interpret: bool = False):
    """Full DiffNet forward with the fused stack kernel.

    `params`: the flax param tree of `models.diffnet.DiffNet`;
    `spec` [B, T, M], `t` [B] int, `cond_proj` [L, B, T, 2C] from
    `DiffNet.cond_projections`. Inference-only (no custom VJP) — the
    training path keeps the XLA implementation.
    """
    from bisinger_tpu.models.diffnet import diffusion_step_embedding

    C = hp["residual_channels"]
    L = hp["residual_layers"]
    cycle = hp["dilation_cycle_length"]
    dilations = [2 ** (i % cycle) for i in range(L)]

    def dense(name, x):
        p = params[name]
        return x @ p["kernel"] + p["bias"]

    def conv1(name, x):
        p = params[name]
        return x @ p["kernel"][0] + p["bias"]

    x = jax.nn.relu(conv1("input_projection", spec))  # [B, T, C]

    s = dense("mlp_0", diffusion_step_embedding(t, C))
    s = s * jnp.tanh(jax.nn.softplus(s))  # Mish
    s = dense("mlp_1", s)  # [B, C]

    wstep = jnp.stack([params[f"res_{i}"]["diffusion_projection"]["kernel"] for i in range(L)])
    bstep = jnp.stack([params[f"res_{i}"]["diffusion_projection"]["bias"] for i in range(L)])
    step_proj = jnp.einsum("bc,lcd->lbd", s, wstep) + bstep[:, None, :]

    wd = jnp.stack([params[f"res_{i}"]["dilated_conv"]["kernel"] for i in range(L)])
    bd = jnp.stack([params[f"res_{i}"]["dilated_conv"]["bias"] for i in range(L)])
    wo = jnp.stack([params[f"res_{i}"]["output_projection"]["kernel"][0] for i in range(L)])
    bo = jnp.stack([params[f"res_{i}"]["output_projection"]["bias"] for i in range(L)])

    skip = fused_residual_stack(
        x, cond_proj, step_proj, wd, bd, wo, bo, dilations,
        b_chunk=int(hp.get("pallas_b_chunk", 0)),
        interpret=interpret,
    )
    y = skip * (1.0 / math.sqrt(L))
    y = jax.nn.relu(conv1("skip_projection", y))
    return conv1("output_projection", y)  # [B, T, M]
