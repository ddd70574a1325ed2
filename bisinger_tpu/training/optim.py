"""Optimizers and LR schedules (optax).

Mirrors the reference training recipes:
  - `rsqrt_schedule`: warmup * rsqrt-decay * hidden^-0.5, floored at 1e-7
    (`utils/training_utils.py:4-27`) — used by the fs2/FFT-Singer stage;
  - `step_decay_schedule`: StepLR gamma=0.5 every `decay_steps`
    (`usr/task.py:75-76`) — used by the diffusion stage;
  - AdamW with the reference betas; optional gradient clipping;
  - `predictor_only_mask`: trainable-mask for DiffSpeech's
    freeze-fs2-except-predictors policy (`usr/diffspeech_task.py:37-39`)
    via `optax.masked` + zeroing.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from bisinger_tpu.config import HParams


def rsqrt_schedule(hp: HParams) -> Callable:
    lr = hp["lr"]
    warmup = hp["warmup_updates"]
    hidden = hp["hidden_size"]

    def schedule(step):
        step = jnp.maximum(step, 1)
        w = jnp.minimum(step / warmup, 1.0)
        rsqrt_decay = jnp.maximum(warmup, step) ** -0.5
        return jnp.maximum(lr * w * rsqrt_decay * hidden ** -0.5, 1e-7)

    return schedule


def step_decay_schedule(hp: HParams) -> Callable:
    lr = hp["lr"]
    decay_steps = hp["decay_steps"]

    def schedule(step):
        return lr * 0.5 ** jnp.floor(step / decay_steps)

    return schedule


def build_optimizer(
    hp: HParams,
    schedule: str = "rsqrt",
    trainable_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """AdamW + clipping (+ optional trainable mask: frozen leaves get
    zero updates)."""
    sched = rsqrt_schedule(hp) if schedule == "rsqrt" else step_decay_schedule(hp)
    tx = optax.chain(
        optax.clip_by_global_norm(hp["clip_grad_norm"])
        if hp.get("clip_grad_norm", 0)
        else optax.identity(),
        optax.adamw(
            learning_rate=sched,
            b1=hp["optimizer_adam_beta1"],
            b2=hp["optimizer_adam_beta2"],
            weight_decay=hp.get("weight_decay", 0.0),
        ),
    )
    if trainable_mask is not None:
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), jax.tree.map(lambda m: not m, trainable_mask)),
            tx,
        )
    accum = hp.get("accumulate_grad_batches", 1)
    if accum and accum > 1:
        # reference GradientAccumulationScheduler (`pl_utils.py:256-280`),
        # constant-factor form
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def predictor_only_mask(params) -> Any:
    """True (=trainable) only for fs2 parameters under a '*predictor*'
    module; everything outside fs2 stays trainable (the denoiser). Matches
    `usr/diffspeech_task.py:37-39`."""
    def decide(path) -> bool:
        keys = [getattr(p, "key", str(p)) for p in path]
        in_fs2 = any(k == "fs2" for k in keys)
        has_pred = any("predictor" in str(k) for k in keys)
        return (not in_fs2) or has_pred

    return jax.tree_util.tree_map_with_path(lambda path, _: decide(path), params)
