"""Pipeline parallelism for the DiffNet denoiser over a 'pipe' mesh axis.

The reference has no pipeline story (single-GPU torch, `usr/diff/net.py`);
this module is scaling infrastructure for denoisers that outgrow one
chip's HBM or whose latency budget wants more chips than tensor
parallelism can use efficiently. Design is the TPU-idiomatic
collective-permute pipeline (GPipe schedule):

  - the L residual blocks are split into S contiguous *stages*; the
    per-block params are stacked on a leading [S] axis and sharded over
    the 'pipe' mesh axis, so each device physically holds 1/S of the
    stack (this is the memory win);
  - a batch is split into M *microbatches*; inside `shard_map`, a
    `lax.scan` over M+S-1 ticks runs one stage per device per tick and
    rotates the (activation, skip-accumulator) pair to the next stage
    with `lax.ppermute` — compute on tick i overlaps the ICI transfer
    of tick i-1's output;
  - the skip-sum crosses stages *with* the activations (DiffNet's output
    is the skip sum, `net.py:120-127`), so no extra collective is needed
    until the final projections;
  - pipeline bubble = (S-1)/(M+S-1): choose M >= ~4*S for >75% fill.

Composes with the 'data' axis (dp x pp) — batch sharded over 'data',
microbatching within each data shard — and is numerically identical to
`DiffNet.__call__` (pinned by `tests/test_pipeline.py`).

Constraint: blocks_per_stage = L/S must be an integer multiple of
`dilation_cycle_length`, so every stage runs the same static dilation
pattern (the default config L=20, cycle=4 pipelines at S in {5}; L=20,
cycle=1 at S in {2,4,5,10,20}).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import mesh_utils

from bisinger_tpu.models.diffnet import diffusion_step_embedding


def make_pipe_mesh(num_pipe: int, num_data: int = 1, devices=None) -> Mesh:
    """('data', 'pipe') mesh. Pipeline neighbours are adjacent on the
    last mesh dim so ppermute rides ICI nearest-neighbour links."""
    devices = list(devices if devices is not None else jax.devices())
    wanted = num_data * num_pipe
    arr = mesh_utils.create_device_mesh(
        (num_data, num_pipe), devices=devices[:wanted]
    )
    return Mesh(arr, ("data", "pipe"))


def split_stages(diffnet_params: Dict, n_stages: int, cycle: int):
    """Split a DiffNet param tree into (shared, stage_blocks).

    shared: input/skip/output projections + step-embedding MLP,
    replicated. stage_blocks: list over j (position within a stage) of
    pytrees whose leaves are stacked [S, ...] over stages — stacking per
    *position* (not per block) keeps each position's static dilation
    2^(j % cycle) uniform across stages.
    """
    res_keys = sorted(
        (k for k in diffnet_params if k.startswith("res_")),
        key=lambda k: int(k.split("_")[1]),
    )
    n_layers = len(res_keys)
    assert n_layers % n_stages == 0, (n_layers, n_stages)
    bps = n_layers // n_stages
    assert bps % cycle == 0, (
        f"blocks_per_stage={bps} must be a multiple of "
        f"dilation_cycle_length={cycle} so all stages share one static "
        f"dilation pattern"
    )
    shared = {
        k: v for k, v in diffnet_params.items() if not k.startswith("res_")
    }
    stage_blocks = []
    for j in range(bps):
        per_stage = [
            diffnet_params[res_keys[s * bps + j]] for s in range(n_stages)
        ]
        stage_blocks.append(
            jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_stage)
        )
    return shared, stage_blocks


def _conv1x1(x, p):
    return jnp.einsum("btc,co->bto", x, p["kernel"][0]) + p["bias"]


def _block_fwd(p, x, cond_p, step, dilation: int):
    """Functional ResidualBlock forward (models/diffnet.py:80-88) on an
    un-stacked param subtree; cond_p is the precomputed conditioner
    projection for this block."""
    s = step @ p["diffusion_projection"]["kernel"] + p["diffusion_projection"]["bias"]
    y = x + s[:, None, :]
    y = lax.conv_general_dilated(
        y,
        p["dilated_conv"]["kernel"],
        window_strides=(1,),
        padding="SAME",
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + p["dilated_conv"]["bias"]
    y = y + cond_p
    gate, filt = jnp.split(y, 2, axis=-1)
    y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
    y = _conv1x1(y, p["output_projection"])
    residual, skip = jnp.split(y, 2, axis=-1)
    return (x + residual) / math.sqrt(2.0), skip


def cond_projections_stacked(
    diffnet_params: Dict, cond, n_stages: int, dtype=None
):
    """[S, bps, B, T, 2C] conditioner projections (step-invariant —
    computed once per utterance, exactly like DiffNet.cond_projections;
    pass dtype=jnp.bfloat16 to match a compute_dtype=bfloat16 module)."""
    res_keys = sorted(
        (k for k in diffnet_params if k.startswith("res_")),
        key=lambda k: int(k.split("_")[1]),
    )
    if dtype is not None:
        cond = cond.astype(dtype)
    proj = jnp.stack(
        [
            _conv1x1(
                cond,
                jax.tree_util.tree_map(
                    lambda a: a.astype(dtype) if dtype is not None else a,
                    diffnet_params[k]["conditioner_projection"],
                ),
            )
            for k in res_keys
        ]
    )  # [L, B, T, 2C]
    L = proj.shape[0]
    return proj.reshape((n_stages, L // n_stages) + proj.shape[1:])


def pipelined_denoiser(
    diffnet_params: Dict,
    hp,
    mesh: Mesh,
    n_micro: int,
    axis_data: str = "data",
    axis_pipe: str = "pipe",
):
    """Return denoise_fn(x, t, cond_proj) running the residual stack
    pipelined over `axis_pipe`, signature-compatible with the samplers'
    denoise_fn hooks (models/diffusion.py). cond_proj is the standard
    [L, B, T, 2C] stack from DiffNet.cond_projections."""
    S = mesh.shape[axis_pipe]
    cycle = int(hp["dilation_cycle_length"])
    c = int(hp["residual_channels"])
    # match DiffNet's mixed precision: blocks in compute_dtype, the
    # zero-init output projection (and the sampler math downstream) fp32
    dtype = (
        jnp.bfloat16 if hp.get("compute_dtype") == "bfloat16" else jnp.float32
    )
    shared, stage_blocks = split_stages(diffnet_params, S, cycle)
    shared = {
        k: (
            v
            if k == "output_projection"
            else jax.tree_util.tree_map(lambda a: a.astype(dtype), v)
        )
        for k, v in shared.items()
    }
    stage_blocks = [
        jax.tree_util.tree_map(lambda a: a.astype(dtype), blk)
        for blk in stage_blocks
    ]
    bps = len(stage_blocks)
    dilations = [2 ** (j % cycle) for j in range(bps)]
    n_layers = S * bps

    def body(shared_p, blocks, x_g, t_g, cond_g):
        # blocks: list of pytrees with leaves [1, ...] (this stage's
        # slice); cond_g: [1, bps, b_loc, T, 2C]; x_g: [b_loc, T, 80]
        stage = lax.axis_index(axis_pipe)
        blocks = [
            jax.tree_util.tree_map(lambda a: a[0], blk) for blk in blocks
        ]
        cond_loc = cond_g[0].astype(dtype)  # [bps, b_loc, T, 2C]
        b_loc, t_len = x_g.shape[0], x_g.shape[1]
        assert b_loc % n_micro == 0, (b_loc, n_micro)
        mb = b_loc // n_micro

        # replicated tiny prolog: input projection + step-embedding MLP
        x0 = jax.nn.relu(
            _conv1x1(x_g.astype(dtype), shared_p["input_projection"])
        )
        emb = diffusion_step_embedding(t_g, c).astype(dtype)
        step = emb @ shared_p["mlp_0"]["kernel"] + shared_p["mlp_0"]["bias"]
        step = step * jnp.tanh(jax.nn.softplus(step))
        step = step @ shared_p["mlp_1"]["kernel"] + shared_p["mlp_1"]["bias"]

        xs = x0.reshape(n_micro, mb, t_len, c)
        steps = step.reshape(n_micro, mb, c)
        conds = cond_loc.reshape(bps, n_micro, mb, t_len, 2 * c)

        perm = [(s, s + 1) for s in range(S - 1)]
        state = (
            jnp.zeros((mb, t_len, c), x0.dtype),
            jnp.zeros((mb, t_len, c), x0.dtype),
        )
        out_buf = jnp.zeros((n_micro, mb, t_len, c), x0.dtype)

        def tick(carry, i):
            (st_x, st_skip), buf = carry
            mb_idx = i - stage
            mbc = jnp.clip(mb_idx, 0, n_micro - 1)
            h = jnp.where(
                stage == 0, lax.dynamic_index_in_dim(xs, mbc, 0, False), st_x
            )
            sk = jnp.where(stage == 0, jnp.zeros_like(st_skip), st_skip)
            step_mb = lax.dynamic_index_in_dim(steps, mbc, 0, False)
            cond_mb = lax.dynamic_index_in_dim(conds, mbc, 1, False)
            for j in range(bps):
                h, s_ = _block_fwd(
                    blocks[j], h, cond_mb[j], step_mb, dilations[j]
                )
                sk = sk + s_
            write = (stage == S - 1) & (mb_idx >= 0) & (mb_idx < n_micro)
            cur = lax.dynamic_index_in_dim(buf, mbc, 0, False)
            buf = lax.dynamic_update_index_in_dim(
                buf, jnp.where(write, sk, cur), mbc, 0
            )
            nxt = lax.ppermute((h, sk), axis_pipe, perm)
            return (nxt, buf), None

        (_, out_buf), _ = lax.scan(
            tick, (state, out_buf), jnp.arange(n_micro + S - 1)
        )
        # results live on the last stage; one psum replicates them so the
        # (tiny) final projections run everywhere and out_specs can
        # declare pipe-replication
        skip_total = lax.psum(out_buf, axis_pipe).reshape(b_loc, t_len, c)
        y = skip_total / math.sqrt(n_layers)
        y = jax.nn.relu(_conv1x1(y, shared_p["skip_projection"]))
        return _conv1x1(
            y.astype(jnp.float32),
            jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32), shared_p["output_projection"]
            ),
        )

    blocks_spec = [
        jax.tree_util.tree_map(lambda _: P(axis_pipe), blk)
        for blk in stage_blocks
    ]
    shared_spec = jax.tree_util.tree_map(lambda _: P(), shared)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            shared_spec,
            blocks_spec,
            P(axis_data),
            P(axis_data),
            P(axis_pipe, None, axis_data),
        ),
        out_specs=P(axis_data),
        check_vma=False,
    )

    def denoise_fn(x, t, cond_proj):
        L = cond_proj.shape[0]
        cond_st = cond_proj.reshape((S, L // S) + cond_proj.shape[1:])
        return fn(shared, stage_blocks, x, t, cond_st)

    return denoise_fn
