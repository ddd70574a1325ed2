"""Fused Pallas DiffNet stack vs the flax reference implementation
(interpret mode on CPU; real compilation is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bisinger_tpu.config import load_hparams
from bisinger_tpu.models.diffnet import DiffNet
from bisinger_tpu.ops.diffnet_pallas import diffnet_forward_pallas


def _derandomize_zero_init(params, rng):
    """The final output_projection is zero-initialized, which would make
    every parity comparison vacuous (0 == 0). Fill it with noise."""
    params = jax.tree.map(lambda x: x, params)  # shallow copy
    k = params["output_projection"]["kernel"]
    params["output_projection"]["kernel"] = (
        0.1 * jax.random.normal(rng, k.shape, k.dtype)
    )
    return params


def _hp(**kw):
    base = dict(
        residual_layers=6,
        residual_channels=256,
        dilation_cycle_length=3,
        hidden_size=256,
        compute_dtype="float32",
    )
    base.update(kw)
    return load_hparams(overrides=base)


@pytest.mark.parametrize("T", [256, 512])
def test_matches_flax(T):
    hp = _hp()
    B, M, C = 2, 80, 256
    model = DiffNet(hp=hp, in_dims=M)
    rng = jax.random.PRNGKey(0)
    spec = jax.random.normal(rng, (B, T, M))
    cond = jax.random.normal(jax.random.fold_in(rng, 1), (B, T, 256))
    t = jnp.array([3, 77], jnp.int32)

    params = model.init(rng, spec, t, cond=cond)["params"]
    params = _derandomize_zero_init(params, jax.random.fold_in(rng, 99))
    cond_proj = model.apply({"params": params}, cond, method=DiffNet.cond_projections)

    ref = model.apply({"params": params}, spec, t, cond_proj=cond_proj)
    out = diffnet_forward_pallas(params, hp, spec, t, cond_proj, interpret=True)

    assert out.shape == ref.shape == (B, T, M)
    scale = np.max(np.abs(np.asarray(ref)))
    assert scale > 0.01, "vacuous comparison: reference output is ~zero"
    # bf16 matmuls in the kernel vs fp32 flax: loose-ish tolerance
    err = np.max(np.abs(np.asarray(out) - np.asarray(ref)))
    assert err / scale < 0.05, (err, scale)


def test_edge_padding_semantics():
    """Zero-pad taps at sequence edges must match the flax SAME conv —
    probe with a short sequence where halos dominate."""
    hp = _hp(residual_layers=4, dilation_cycle_length=4)  # dilations 1,2,4,8
    B, T, M = 1, 64, 80
    model = DiffNet(hp=hp, in_dims=M)
    rng = jax.random.PRNGKey(42)
    spec = jax.random.normal(rng, (B, T, M))
    cond = jax.random.normal(jax.random.fold_in(rng, 1), (B, T, 256))
    t = jnp.array([11], jnp.int32)
    params = model.init(rng, spec, t, cond=cond)["params"]
    params = _derandomize_zero_init(params, jax.random.fold_in(rng, 99))
    cond_proj = model.apply({"params": params}, cond, method=DiffNet.cond_projections)

    ref = np.asarray(model.apply({"params": params}, spec, t, cond_proj=cond_proj))
    out = np.asarray(diffnet_forward_pallas(params, hp, spec, t, cond_proj, interpret=True))
    # compare the FIRST and LAST 8 frames specifically (halo region)
    err = np.max(np.abs(out[:, :8] - ref[:, :8])) + np.max(np.abs(out[:, -8:] - ref[:, -8:]))
    assert err / (np.max(np.abs(ref)) + 1e-6) < 0.05


def test_backend_flag_in_module():
    """DiffNet.apply with diffnet_backend=pallas routes through the fused
    kernel (interpret on CPU) and matches the XLA path."""
    hp_x = _hp()
    hp_p = hp_x.replace(diffnet_backend="pallas")
    B, T, M = 2, 128, 80
    rng = jax.random.PRNGKey(7)
    spec = jax.random.normal(rng, (B, T, M))
    cond = jax.random.normal(jax.random.fold_in(rng, 1), (B, T, 256))
    t = jnp.array([5, 9], jnp.int32)

    m_x = DiffNet(hp=hp_x, in_dims=M)
    params = m_x.init(rng, spec, t, cond=cond)["params"]
    params = _derandomize_zero_init(params, jax.random.fold_in(rng, 99))
    ref = m_x.apply({"params": params}, spec, t, cond=cond)

    m_p = DiffNet(hp=hp_p, in_dims=M)
    out = m_p.apply({"params": params}, spec, t, cond=cond)
    err = np.max(np.abs(np.asarray(out) - np.asarray(ref)))
    assert err / (np.max(np.abs(np.asarray(ref))) + 1e-6) < 0.05


def test_chunk_boundary_halo():
    """Layer-0 halo across time-chunk boundaries: the copy pass must land
    ALL chunks before any conv reads a neighbor (regression for the
    right-halo-of-zeros bug). Checked at strict per-frame tolerance
    around each chunk edge with a small t_chunk."""
    from bisinger_tpu.ops.diffnet_pallas import fused_residual_stack
    import math

    hp = _hp(residual_layers=4, dilation_cycle_length=4)
    B, T, M, C = 1, 256, 80, 256
    model = DiffNet(hp=hp, in_dims=M)
    rng = jax.random.PRNGKey(3)
    spec = jax.random.normal(rng, (B, T, M))
    cond = jax.random.normal(jax.random.fold_in(rng, 1), (B, T, C))
    t = jnp.array([9], jnp.int32)
    params = model.init(rng, spec, t, cond=cond)["params"]
    params = _derandomize_zero_init(params, jax.random.fold_in(rng, 99))
    cond_proj = model.apply({"params": params}, cond, method=DiffNet.cond_projections)

    ref = np.asarray(model.apply({"params": params}, spec, t, cond_proj=cond_proj))
    out = np.asarray(
        diffnet_forward_pallas(params, hp, spec, t, cond_proj, interpret=True)
    )
    scale = np.max(np.abs(ref)) + 1e-6
    # default t_chunk=128 -> boundary at frame 128; probe +-16 frames
    for lo, hi in [(112, 144), (0, 16), (240, 256)]:
        err = np.max(np.abs(out[:, lo:hi] - ref[:, lo:hi]))
        assert err / scale < 0.05, (lo, hi, err, scale)


def test_batch_tiling_blocks():
    """Multiple batch blocks (grid n_b > 1) must match the single-block
    result exactly — scratch is re-initialised per block, halo padding
    stays zero across blocks."""
    import math

    from bisinger_tpu.ops.diffnet_pallas import fused_residual_stack

    rng = jax.random.PRNGKey(7)
    B, T, C, L = 4, 128, 256, 4
    dils = [2 ** (i % 2) for i in range(L)]
    keys = jax.random.split(rng, 8)
    x0 = jax.random.normal(keys[0], (B, T, C))
    cond = jax.random.normal(keys[1], (L, B, T, 2 * C))
    step = jax.random.normal(keys[2], (L, B, C))
    wd = 0.1 * jax.random.normal(keys[3], (L, 3, C, 2 * C))
    bd = 0.1 * jax.random.normal(keys[4], (L, 2 * C))
    wo = 0.1 * jax.random.normal(keys[5], (L, C, 2 * C))
    bo = 0.1 * jax.random.normal(keys[6], (L, 2 * C))

    full = fused_residual_stack(
        x0, cond, step, wd, bd, wo, bo, dils, b_chunk=4, interpret=True
    )
    tiled = fused_residual_stack(
        x0, cond, step, wd, bd, wo, bo, dils, b_chunk=1, interpret=True
    )
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full), atol=1e-5)
