"""Pipeline parallelism (parallel/pipeline.py) — exactness vs the plain
DiffNet and end-to-end PLMS sampling with the pipelined denoiser.

Runs a (data=2, pipe=4) mesh on the virtual 8-device CPU backend: the
residual stack is stage-sharded over 'pipe', microbatches rotate with
ppermute, and the result must equal `DiffNet.__call__` bit-for-bit up to
fp reassociation (the skip psum)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bisinger_tpu.config import load_hparams
from bisinger_tpu.models.diffnet import DiffNet
from bisinger_tpu.parallel.pipeline import (
    cond_projections_stacked,
    make_pipe_mesh,
    pipelined_denoiser,
    split_stages,
)

B, T, M, H, C, L = 4, 32, 80, 48, 32, 8


@pytest.fixture(scope="module")
def env():
    # compute_dtype float32 for tight exactness bounds (the bf16 default
    # is exercised separately below)
    hp = load_hparams(
        overrides=dict(
            residual_layers=L,
            residual_channels=C,
            dilation_cycle_length=2,
            hidden_size=H,
            compute_dtype="float32",
        )
    )
    net = DiffNet(hp=hp, in_dims=M)
    rng = jax.random.PRNGKey(0)
    r = np.random.RandomState(0)
    spec = jnp.asarray(r.randn(B, T, M).astype(np.float32))
    cond = jnp.asarray(r.randn(B, T, H).astype(np.float32))
    t = jnp.asarray(r.randint(0, 100, (B,)), jnp.int32)
    params = net.init(rng, spec, t, cond)["params"]
    # the final projection is zero-init (models/diffnet.py:127-130) —
    # randomize it so the parity assertions below see real signal
    params = jax.tree_util.tree_map(lambda a: a, params)  # unfreeze-safe copy
    params["output_projection"] = dict(
        kernel=jnp.asarray(
            r.randn(*params["output_projection"]["kernel"].shape) * 0.1,
            jnp.float32,
        ),
        bias=jnp.asarray(
            r.randn(*params["output_projection"]["bias"].shape) * 0.1,
            jnp.float32,
        ),
    )
    ref = net.apply({"params": params}, spec, t, cond=cond)
    assert float(jnp.abs(ref).max()) > 1e-3  # non-vacuous
    return hp, net, params, spec, cond, t, ref


def test_split_stages_shapes(env):
    hp, net, params, *_ = env
    shared, blocks = split_stages(params, 4, 2)
    assert len(blocks) == 2  # blocks per stage
    assert blocks[0]["dilated_conv"]["kernel"].shape == (4, 3, C, 2 * C)
    assert "input_projection" in shared and "res_0" not in shared


def test_split_stages_rejects_bad_dilation_split(env):
    hp, net, params, *_ = env
    # 8 layers / 8 stages = 1 block per stage, cycle 2 -> stages would
    # run different dilations; must fail loudly
    with pytest.raises(AssertionError):
        split_stages(params, 8, 2)


def test_pipelined_matches_plain(env):
    hp, net, params, spec, cond, t, ref = env
    mesh = make_pipe_mesh(num_pipe=4, num_data=2)
    cond_proj = net.apply(
        {"params": params}, cond, method=DiffNet.cond_projections
    )
    with mesh:
        for n_micro in (1, 2):
            dn = pipelined_denoiser(params, hp, mesh, n_micro=n_micro)
            out = np.asarray(jax.device_get(dn(spec, t, cond_proj)))
            np.testing.assert_allclose(out, np.asarray(ref), atol=1e-4)


def test_cond_projections_stacked_matches_module(env):
    hp, net, params, spec, cond, t, ref = env
    proj_mod = net.apply(
        {"params": params}, cond, method=DiffNet.cond_projections
    )
    proj_st = cond_projections_stacked(params, cond, 4)
    np.testing.assert_allclose(
        np.asarray(proj_st).reshape(L, B, T, 2 * C),
        np.asarray(proj_mod),
        atol=1e-5,
    )


def test_pipelined_under_jit_scan(env):
    """The pipelined apply must trace inside jit + lax.scan (the sampler
    regime): shard_map composes with both."""
    hp, net, params, spec, cond, t, ref = env
    mesh = make_pipe_mesh(num_pipe=4, num_data=2)
    cond_proj = net.apply(
        {"params": params}, cond, method=DiffNet.cond_projections
    )
    with mesh:
        dn = pipelined_denoiser(params, hp, mesh, n_micro=2)

        @jax.jit
        def run(x):
            def body(carry, _):
                return carry + 0.1 * dn(carry, t, cond_proj), None

            y, _ = jax.lax.scan(body, x, None, length=3)
            return y

        out = np.asarray(jax.device_get(run(spec)))
    # same composite computed eagerly
    x = spec
    for _ in range(3):
        x = x + 0.1 * net.apply({"params": params}, x, t, cond=cond)
    np.testing.assert_allclose(out, np.asarray(x), atol=1e-3)


def test_plms_sampling_with_pipelined_denoiser(env):
    """GaussianDiffusion.plms_sample_loop(denoise_fn=pipelined) == the
    in-module denoiser path."""
    from bisinger_tpu.models.diffusion import GaussianDiffusion

    hp, net, params, spec, cond, t, ref = env
    hp_d = hp.replace(
        timesteps=8, K_step=8, pndm_speedup=2, diff_decoder_type="wavenet",
        audio_num_mel_bins=M,
    )

    class Sampler(GaussianDiffusion):
        def sample(self, x, cond, denoise_fn=None):
            cond_proj = self.denoise_fn.cond_projections(cond)
            return self.plms_sample_loop(
                x, cond_proj, self.K_step, 2, denoise_fn=denoise_fn
            )

    gd = Sampler(hp=hp_d, vocab_size=8, out_dims=M)
    rng = jax.random.PRNGKey(1)
    gd_params = {"denoise_fn": params}
    x0 = jnp.asarray(np.random.RandomState(3).randn(B, T, M).astype(np.float32))

    ref_mel = gd.apply({"params": gd_params}, x0, cond, method=Sampler.sample)

    mesh = make_pipe_mesh(num_pipe=4, num_data=2)
    cond_proj = net.apply(
        {"params": params}, cond, method=DiffNet.cond_projections
    )
    with mesh:
        dn = pipelined_denoiser(params, hp, mesh, n_micro=2)
        pp_mel = gd.apply(
            {"params": gd_params},
            x0,
            cond,
            lambda x, t: dn(x, t, cond_proj),
            method=Sampler.sample,
        )
    np.testing.assert_allclose(
        np.asarray(pp_mel), np.asarray(ref_mel), atol=1e-3
    )


def test_pipelined_bf16_default_dtype():
    """With the production default compute_dtype=bfloat16 the pipelined
    apply tracks the module within bf16 tolerance (same ops, same
    precision; only the skip psum reassociates)."""
    hp = load_hparams(
        overrides=dict(
            residual_layers=L,
            residual_channels=C,
            dilation_cycle_length=2,
            hidden_size=H,
        )
    )
    assert hp["compute_dtype"] == "bfloat16"
    net = DiffNet(hp=hp, in_dims=M)
    r = np.random.RandomState(1)
    spec = jnp.asarray(r.randn(B, T, M).astype(np.float32))
    cond = jnp.asarray(r.randn(B, T, H).astype(np.float32))
    t = jnp.asarray(r.randint(0, 100, (B,)), jnp.int32)
    params = net.init(jax.random.PRNGKey(0), spec, t, cond)["params"]
    params["output_projection"] = dict(
        kernel=jnp.asarray(
            r.randn(*params["output_projection"]["kernel"].shape) * 0.1,
            jnp.float32,
        ),
        bias=jnp.zeros_like(params["output_projection"]["bias"]),
    )
    ref = np.asarray(net.apply({"params": params}, spec, t, cond=cond))
    mesh = make_pipe_mesh(num_pipe=4, num_data=2)
    cond_proj = net.apply(
        {"params": params}, cond, method=DiffNet.cond_projections
    )
    with mesh:
        dn = pipelined_denoiser(params, hp, mesh, n_micro=2)
        out = np.asarray(jax.device_get(dn(spec, t, cond_proj)))
    assert np.abs(ref).max() > 1e-3
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.05)
