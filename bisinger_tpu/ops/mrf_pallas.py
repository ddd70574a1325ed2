"""Fused Pallas TPU kernel for the HiFi-GAN MRF (multi-receptive-field)
residual stage.

Each upsample stage of the generator (reference `hifigan.py:104-173`)
runs 3 ResBlocks x 3 dilations x 2 convs = 18 narrow convolutions over a
very long time axis, plus residual adds and the cross-block mean. In the
XLA path every conv round-trips the [B, T, C] activations through HBM —
~36 full passes per stage — and the stage is bandwidth-bound (measured:
the vocoder sits at ~32% MXU peak while the per-conv GEMMs are tiny).

Overlap-save design: the grid is (batch blocks, time chunks) ONLY; each
chunk is loaded once WITH a halo equal to the largest per-block
receptive field, then the whole op stack (all 3 blocks x 3 dilations x
2 convs, residual adds, cross-block mean) runs back-to-back on
VMEM-resident buffers, and the central Uc frames are written once. All
stacked weights ride along as a constant-index input, so the pipeline
fetches them a single time. HBM traffic ≈ (1 + 2H/Uc) reads + 1 write
of the stage activations, vs ~36 passes for per-conv XLA; the price is
recomputing the 2H halo frames per chunk (~6-12% extra FLOPs at
Uc=2048).

STATUS (measured on v5e, 2026-08-17): EXPERIMENTAL, off by default.
The XLA path runs the B=24/T=1024 bench MRF stages at 17-73 TFLOP/s
(~190 ms total); this kernel is numerically exact (interpret-mode
tests) but does not beat that on the current toolchain:
  - tap_mode="static" (unrolled, statically-unaligned time slices):
    Mosaic lowers each unaligned sublane read to shuffle chains; one
    k=3 block took >17 min to compile through the tunnel — unusable.
  - tap_mode="roll" (fori_loop taps, fp32 rotate after the GEMM):
    compiles in ~2 min but the dynamic rotate + serialized scratch
    read-modify-write measured ~39 ms for one k=3 block at U=2048 —
    far off the MXU roofline.
An XLA-level per-tap-GEMM rewrite was also measured (29 TFLOP/s —
worse than XLA's own conv lowering). Until Mosaic grows fast unaligned
sublane reads or sub-32-bit rotates, `vocoder_time_fold` + XLA convs
remain the production vocoder path (BASELINE.md).

Unified op model: every conv — natively dilated (C >= 128 stages) or
time-folded (`ops/time_fold.py`, narrow tail stages) — is a static list
of tap shifts: y[u] = sum_q lrelu(src[u + shift_q]) @ W[q] + b. Validity
shrinks by each conv's (left, right) tap extent as ops chain inside a
block; every block restarts from the pristine input window, so the halo
only needs to cover ONE block's receptive-field sum (blocks are parallel
branches of the mean, not chained). Zero-padded window edges at the
sequence boundary reproduce SAME zero padding exactly (lrelu(0) == 0).

Inference-only (no custom VJP) — training runs the XLA path.
"""

from __future__ import annotations

import functools
from typing import Any, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LRELU_SLOPE = 0.1


class _ConvDesc(NamedTuple):
    shifts: Tuple[int, ...]  # static tap offsets
    wslot: int  # row in the stacked weight/bias arrays


def _lrelu(x):
    # max/min form: Mosaic rejects bf16 vector comparisons
    # ("Target does not support this comparison"), but maximum/minimum
    # lower fine; identical arithmetic to where(x >= 0, x, slope*x).
    return jnp.maximum(x, 0) + jnp.asarray(_LRELU_SLOPE, x.dtype) * jnp.minimum(x, 0)


def _conv_shifts(k: int, dil: int, fold: int) -> Tuple[int, ...]:
    """Tap shifts of one conv in (possibly folded) time units, matching
    `ops/time_fold.py:fold_conv_weight` row order (shift = row - lo)."""
    if fold > 1:
        from bisinger_tpu.ops.time_fold import fold_conv_weight

        # geometry only — probe with zeros to get (lo, hi)
        _, _, (lo, hi) = fold_conv_weight(
            np.zeros((k, 1, 1), np.float32), np.zeros((1,)), fold, dilation=dil
        )
        return tuple(range(-lo, hi + 1))
    delta = dil * (k - 1) // 2
    return tuple(q * dil - delta for q in range(k))


def plan_stage(
    rk: Sequence[int],
    rd: Sequence[Sequence[int]],
    fold: int,
) -> Tuple[List[List[_ConvDesc]], List[Tuple[int, int, int]]]:
    """Static op program for one MRF stage.

    Returns (blocks, descr): blocks[j] is the ordered conv list of
    ResBlock j (conv1, conv2 per dilation); descr[slot] = (block,
    dil_idx, which_conv) gives the weight-stacking order."""
    blocks: List[List[_ConvDesc]] = []
    descr: List[Tuple[int, int, int]] = []
    slot = 0
    for j, (k, dils) in enumerate(zip(rk, rd)):
        ops: List[_ConvDesc] = []
        for di, d in enumerate(dils):
            for which, dil in ((1, d), (2, 1)):
                ops.append(_ConvDesc(_conv_shifts(k, dil, fold), slot))
                descr.append((j, di, which))
                slot += 1
        blocks.append(ops)
    return blocks, descr


def stage_halo(blocks: Sequence[Sequence[_ConvDesc]]) -> int:
    """Halo (each side) covering the worst single block's chained
    receptive field, rounded up to the 8-sublane tile."""
    h = 0
    for ops in blocks:
        left = sum(max(0, -min(op.shifts)) for op in ops)
        right = sum(max(0, max(op.shifts)) for op in ops)
        h = max(h, left, right)
    return -(-max(h, 1) // 8) * 8


def stack_stage_weights(
    block_params: Sequence[Any],
    rk: Sequence[int],
    rd: Sequence[Sequence[int]],
    fold: int,
    dtype=jnp.bfloat16,
):
    """block_params[j] = {'conv1_0': {'kernel','bias'}, 'conv2_0': ...}
    (the ResBlock1 param tree) -> (w_all [S, kf_max, F, F],
    b_all [S, 1, F]); row q of slot s holds the weight of tap shift
    shifts[q]."""
    from bisinger_tpu.ops.time_fold import fold_conv_weight

    _, descr = plan_stage(rk, rd, fold)
    ws, bs = [], []
    for j, di, which in descr:
        p = block_params[j][f"conv{which}_{di}"]
        w, b = p["kernel"], p["bias"]
        dil = rd[j][di] if which == 1 else 1
        if fold > 1:
            w, b, _ = fold_conv_weight(w, b, fold, dilation=dil)
        ws.append(jnp.asarray(w, dtype))
        bs.append(jnp.asarray(b, jnp.float32))
    kf_max = max(w.shape[0] for w in ws)
    F = ws[0].shape[1]
    w_all = jnp.stack(
        [
            jnp.concatenate(
                [w, jnp.zeros((kf_max - w.shape[0], F, F), w.dtype)]
            )
            if w.shape[0] < kf_max
            else w
            for w in ws
        ]
    )
    b_all = jnp.stack([b[None, :] for b in bs])
    return w_all, b_all


def _mrf_kernel_static(
    w_ref,  # [S, kf_max, F, F] all stage weights (constant index map)
    b_ref,  # [S, 1, F] all stage biases
    xw_ref,  # [Bb, 1, L, F] input chunk window (L = Uc + 2H)
    out_ref,  # out: [Bb, Uc, F]
    state,  # scratch [Bb, L, F] running block state (compute dtype)
    tbuf,  # scratch [Bb, L, F] conv1 intermediate
    acc,  # scratch [Bb, Uc, F] fp32 cross-block sum
    *,
    blocks: Tuple[Tuple[_ConvDesc, ...], ...],
    Uc: int,
    H: int,
    F: int,
    U: int,
):
    """Taps unrolled with STATIC slice starts. Mosaic lowers the
    unaligned time-axis reads to sublane shuffles — a long ONE-TIME
    compile (persistent-cached) but full-rate MXU execution."""
    Bb = out_ref.shape[0]
    L = Uc + 2 * H
    t = pl.program_id(1)

    # SAME zero padding re-zeroes every conv's input outside the
    # sequence, but bias + residual adds make those positions nonzero
    # after the first conv — mask every state/tbuf write back to zero
    # there (no-op for interior chunks, where the window is all-real).
    pos = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) - H + t * Uc
    seq_mask = ((pos >= 0) & (pos < U)).astype(jnp.float32)

    def conv(src_ref, a0, b0, op):
        """y[u] = sum_q lrelu(src[u+shift_q]) @ W[q] + bias over the
        valid region [a, L-b); returns (y, a, b)."""
        a = a0 + max(0, -min(op.shifts))
        b = b0 + max(0, max(op.shifts))
        n = L - a - b
        y = None
        for q, sh in enumerate(op.shifts):
            xs = src_ref[:, a + sh : a + sh + n, :]
            part = jax.lax.dot_general(
                _lrelu(xs).reshape(Bb * n, F),
                w_ref[op.wslot, q],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = part if y is None else y + part
        y = y.reshape(Bb, n, F) + b_ref[op.wslot].astype(jnp.float32)[None]
        return y, a, b

    acc[...] = jnp.zeros((Bb, Uc, F), acc.dtype)
    for ops in blocks:
        state[...] = xw_ref[:, 0].astype(state.dtype)
        a = b = 0
        for conv1, conv2 in zip(ops[0::2], ops[1::2]):
            y1, a1, b1 = conv(state, a, b, conv1)
            tbuf[:, a1 : L - b1, :] = (
                y1 * seq_mask[a1 : L - b1][None]
            ).astype(tbuf.dtype)
            y2, a, b = conv(tbuf, a1, b1, conv2)
            cur = state[:, a : L - b, :]
            state[:, a : L - b, :] = (
                (cur.astype(jnp.float32) + y2) * seq_mask[a : L - b][None]
            ).astype(state.dtype)
        acc[...] += state[:, H : H + Uc, :].astype(jnp.float32)

    out_ref[...] = (acc[...] / len(blocks)).astype(out_ref.dtype)


def _mrf_kernel_roll(
    w_ref,
    b_ref,
    xw_ref,
    out_ref,
    state,
    tbuf,
    vbuf,  # scratch [Bb, L, F] lrelu(src), staged once per conv
    ybuf,  # scratch [Bb, L, F] fp32 per-conv accumulator
    acc,
    *,
    blocks: Tuple[Tuple[_ConvDesc, ...], ...],
    Uc: int,
    H: int,
    F: int,
    U: int,
):
    """Rolled-tap variant: every access sublane-aligned; the tap shift
    is a `pltpu.roll` of the fp32 GEMM output (rotates only support
    32-bit data), taps in a fori_loop — tiny program, fast compile.
    Measured FAR slower at run time than the static kernel (dynamic
    rotate + serialized scratch RMW), kept for compile-time-sensitive
    paths and as lowering documentation. Rolls wrap window edges; the
    wrap reach is bounded by the per-op halo and H covers the chained
    receptive field, so the central Uc frames are exact."""
    Bb = out_ref.shape[0]
    L = Uc + 2 * H
    t = pl.program_id(1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) - H + t * Uc
    seq_mask = ((pos >= 0) & (pos < U)).astype(jnp.float32)

    def conv(src_ref, op):
        # shifts are affine in q (unfolded: q*dil - delta; folded:
        # q - lo), so the loop index reconstructs them
        base = op.shifts[0]
        stride = op.shifts[1] - op.shifts[0] if len(op.shifts) > 1 else 1
        assert all(
            s == base + q * stride for q, s in enumerate(op.shifts)
        ), op.shifts
        vbuf[...] = _lrelu(src_ref[...])
        ybuf[...] = jnp.zeros((Bb, L, F), ybuf.dtype)

        def tap(q, carry):
            sh = base + q * stride
            z = jax.lax.dot_general(
                vbuf[...].reshape(Bb * L, F),
                w_ref[op.wslot, q],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(Bb, L, F)
            # roll AFTER the matmul: sum_q roll(v @ W_q, -sh_q)
            # == sum_q v[u+sh_q] @ W_q
            ybuf[...] += pltpu.roll(z, jnp.mod(-sh, L), axis=1)
            return carry

        jax.lax.fori_loop(0, len(op.shifts), tap, 0)
        ybuf[...] += b_ref[op.wslot].astype(jnp.float32)[None]

    acc[...] = jnp.zeros((Bb, Uc, F), acc.dtype)
    for ops in blocks:
        state[...] = xw_ref[:, 0].astype(state.dtype)
        for conv1, conv2 in zip(ops[0::2], ops[1::2]):
            conv(state, conv1)
            tbuf[...] = (ybuf[...] * seq_mask[None]).astype(tbuf.dtype)
            conv(tbuf, conv2)
            state[...] = (
                (state[...].astype(jnp.float32) + ybuf[...]) * seq_mask[None]
            ).astype(state.dtype)
        acc[...] += state[:, H : H + Uc, :].astype(jnp.float32)

    out_ref[...] = (acc[...] / len(blocks)).astype(out_ref.dtype)


def pick_mrf_batch_chunk(
    B: int, L: int, Uc: int, F: int, w_bytes: int, budget: int
) -> int:
    """Largest divisor Bb of B whose scratch + resident weights fit
    (inputs/outputs counted twice for the pipeline's double buffering)."""
    per_b = (
        3 * L * F * 2  # state + tbuf + vbuf scratch (compute dtype)
        + L * F * 4  # ybuf per-conv accumulator (fp32)
        + Uc * F * 4  # acc scratch (fp32)
        + 2 * (L * F * 2 + Uc * F * 2)  # in/out blocks, double-buffered
    )
    for bb in sorted((d for d in range(1, B + 1) if B % d == 0), reverse=True):
        if 2 * w_bytes + bb * per_b <= budget:
            return bb
    return 0


def fused_mrf_stage(
    x: jax.Array,  # [B, U, F] stage input (already folded if fold > 1)
    block_params: Sequence[Any],  # ResBlock1 param trees, one per block
    rk: Sequence[int],
    rd: Sequence[Sequence[int]],
    fold: int,
    *,
    u_chunk: int = 2048,
    vmem_budget: int = 96 * 1024 * 1024,
    compute_dtype=jnp.bfloat16,
    tap_mode: str = "static",
    interpret: bool = False,
) -> jax.Array:
    """-> mean over blocks of ResBlock1(x) [B, U, F], input dtype."""
    B, U, F = x.shape
    blocks, _ = plan_stage(rk, rd, fold)
    w_all, b_all = stack_stage_weights(block_params, rk, rd, fold, compute_dtype)
    S, kf_max = w_all.shape[:2]
    H = stage_halo(blocks)
    Uc = min(u_chunk, -(-U // 8) * 8)
    n_t = -(-U // Uc)
    L = Uc + 2 * H
    w_bytes = S * kf_max * F * F * 2 + S * F * 4
    Bb = pick_mrf_batch_chunk(B, L, Uc, F, w_bytes, vmem_budget)
    assert Bb and B % Bb == 0, (B, U, F, Bb)

    # overlapping halo windows, materialized once in HBM (BlockSpecs
    # address non-overlapping tiles only): [B, n_t, L, F]
    xp = jnp.pad(x, ((0, 0), (H, H + n_t * Uc - U), (0, 0)))
    idx = np.arange(n_t)[:, None] * Uc + np.arange(L)[None]
    xw = xp[:, idx]

    kernel = _mrf_kernel_roll if tap_mode == "roll" else _mrf_kernel_static
    scratch = [
        pltpu.VMEM((Bb, L, F), compute_dtype),  # state
        pltpu.VMEM((Bb, L, F), compute_dtype),  # tbuf
    ]
    if tap_mode == "roll":
        scratch += [
            pltpu.VMEM((Bb, L, F), compute_dtype),  # vbuf
            pltpu.VMEM((Bb, L, F), jnp.float32),  # ybuf
        ]
    scratch.append(pltpu.VMEM((Bb, Uc, F), jnp.float32))  # acc

    out = pl.pallas_call(
        functools.partial(
            kernel,
            blocks=tuple(tuple(ops) for ops in blocks),
            Uc=Uc,
            H=H,
            F=F,
            U=U,
        ),
        grid=(B // Bb, n_t),
        in_specs=[
            pl.BlockSpec((S, kf_max, F, F), lambda b, t: (0, 0, 0, 0)),
            pl.BlockSpec((S, 1, F), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((Bb, 1, L, F), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Bb, Uc, F), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_t * Uc, F), x.dtype),
        scratch_shapes=scratch,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(w_all, b_all, xw.astype(compute_dtype))
    return out[:, :U]
