"""DPM-Solver++(2M) sampler (arXiv:2211.01095) — the fast alternative to
the reference's PLMS chain."""

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _batch, _tiny_hp
from bisinger_tpu.training.tasks import DiffSingerMIDITask


def _task_and_state(hp):
    task = DiffSingerMIDITask(hp, 32)
    batch = _batch(2, 16, 64, 32)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    return task, state, batch


def test_exact_model_recovers_x0():
    """With an oracle eps model for a known x0, the solver must return
    exactly that x0 (validates schedule wiring + data-prediction form)."""
    hp = _tiny_hp().replace(diff_sampler="dpmpp", dpm_steps=8)
    task, state, batch = _task_and_state(hp)
    model = task.model
    b = model.bind({"params": state.params})
    buffers = b.buffers
    ac = jnp.asarray(np.asarray(buffers.alphas_cumprod))

    x0_true = jnp.asarray(
        np.random.default_rng(0).uniform(-0.9, 0.9, (2, 64, 80)).astype(np.float32)
    )

    def oracle(x, tb):
        a = jnp.sqrt(ac[tb])[:, None, None]
        s = jnp.sqrt(1.0 - ac[tb])[:, None, None]
        return (x - a * x0_true) / s

    x_start = jax.random.normal(jax.random.PRNGKey(1), x0_true.shape)
    out = b.dpmpp_sample_loop(x_start, None, k=hp["timesteps"], steps=8, denoise_fn=oracle)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_true), atol=1e-4)


def test_solver_self_consistency():
    """ODE solver convergence: 60-step and 15-step chains from the same
    start with the same (untrained) denoiser land close together."""
    hp = _tiny_hp().replace(timesteps=100, K_step=100)
    task, state, batch = _task_and_state(hp)
    model = task.model
    b = model.bind({"params": state.params}, rngs={"diffusion": jax.random.PRNGKey(0)})
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 64, hp["hidden_size"]))
    cond_proj = b.denoise_fn.cond_projections(cond)
    x_start = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 80))

    hi = np.asarray(b.dpmpp_sample_loop(x_start, cond_proj, k=100, steps=60))
    lo = np.asarray(b.dpmpp_sample_loop(x_start, cond_proj, k=100, steps=15))
    assert np.isfinite(hi).all() and np.isfinite(lo).all()
    denom = np.abs(hi).mean() + 1e-6
    assert np.abs(hi - lo).mean() / denom < 0.25, np.abs(hi - lo).mean() / denom


def test_dpmpp_through_full_model():
    """diff_sampler=dpmpp drives the full GaussianDiffusion infer path."""
    hp = _tiny_hp().replace(diff_sampler="dpmpp", dpm_steps=6)
    task, state, batch = _task_and_state(hp)
    ret = task.infer_step(state.params, batch, jax.random.PRNGKey(1))
    mel = np.asarray(ret["mel_out"])
    assert mel.shape == (2, 64, 80)
    assert np.isfinite(mel).all()
