"""Checkpointing: orbax-backed keep-latest-N + best-by-val_loss.

Replaces the reference checkpointer (`utils/pl_utils.py:283-350,598-774`):
atomic writes, latest-K retention, optional best tracking, and
cross-model warm-start loading (`utils/__init__.py:179-210` semantics:
load a sub-tree, drop shape mismatches) used to initialize diffusion's
fs2 from the FFT-Singer run.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        save_best: bool = False,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m["val_loss"]) if save_best else None,
            best_mode="min" if save_best else "max",
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metrics: Optional[Dict[str, float]] = None):
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()} or None,
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore without a template: the saved pytree as nested dicts
        of arrays. For cross-model warm starts (e.g. loading the
        FFT-Singer stage's params into diffusion's fs2 subtree) where no
        matching TrainState template exists."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore())

    def close(self):
        self._mgr.close()


def load_params_into(target_params: Dict, source_params: Dict, subtree: str = "") -> Dict:
    """Warm-start: copy leaves from source into target where names+shapes
    match; keep target values elsewhere (reference `utils.load_ckpt`
    non-strict behaviour). `subtree` selects e.g. 'fs2' from the source."""
    src = source_params
    if subtree:
        for k in subtree.split("/"):
            src = src[k]

    def merge(dst, s):
        if isinstance(dst, dict):
            return {
                k: merge(dst[k], s[k]) if isinstance(s, dict) and k in s else dst[k]
                for k in dst
            }
        if s is None:
            return dst
        if hasattr(s, "shape") and hasattr(dst, "shape") and s.shape == dst.shape:
            return s
        return dst

    return merge(target_params, src)
