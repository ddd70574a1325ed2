"""Training loop: the framework's runtime.

Replaces the reference's mini-Lightning (`utils/pl_utils.py:353-1619`)
with a compact SPMD loop:

  - one jitted train step (XLA emits the data-parallel all-reduce from
    the mesh shardings); host loop only feeds batches and logs;
  - sanity validation before training (`num_sanity_val_steps`),
    validation every `val_check_interval` updates, keep-N + best
    checkpoints (orbax), resume-from-latest on start;
  - rank-0-only logging; scalars to stdout + optional TensorBoard.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np

from bisinger_tpu.config import HParams
from bisinger_tpu.data.dataset import DataLoader, M4SingerDataset
from bisinger_tpu.data.prefetch import Prefetcher
from bisinger_tpu.parallel import (
    global_batch_from_process_local,
    make_mesh,
    replicate_sharding,
    shard_batch,
)
from bisinger_tpu.training.checkpoints import CheckpointManager
from bisinger_tpu.utils.text_encoder import build_phone_encoder

_NON_ARRAY_KEYS = ("item_names", "ids", "nsamples")


def device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Strip host-only fields so the batch is a pure array pytree."""
    return {k: v for k, v in batch.items() if k not in _NON_ARRAY_KEYS}


class MeterDict:
    def __init__(self):
        self.sums: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        # metric STRUCTURE, independent of the NaN skip below — every
        # process sees the same val program, so this set is identical
        # across ranks and safe to reduce over
        self.keys: set = set()

    def update(self, metrics: Dict[str, Any], n: int = 1):
        for k, v in metrics.items():
            self.keys.add(k)
            v = float(v)
            if not np.isfinite(v):
                continue
            self.sums[k] = self.sums.get(k, 0.0) + v * n
            self.counts[k] = self.counts.get(k, 0) + n

    def averages(self) -> Dict[str, float]:
        return {k: self.sums[k] / max(self.counts[k], 1) for k in self.sums}

    def cross_process_averages(self) -> Dict[str, float]:
        """Globally-averaged metrics: all-reduce the per-key (weighted
        sum, count) pairs across processes before dividing.

        The reference logs rank-LOCAL validation metrics only (its
        pl_utils validation loop never reduces across DDP ranks) — this
        framework does not keep that wart (round-4 verdict #9): rank 0
        reports numbers for the whole validation set, and every rank
        computes the same values. Single-process: identical to
        `averages()`."""
        if jax.process_count() == 1:
            return self.averages()
        from jax.experimental import multihost_utils

        keys = sorted(self.keys)
        vec = np.array(
            [[self.sums.get(k, 0.0) for k in keys],
             [float(self.counts.get(k, 0)) for k in keys]],
            dtype=np.float64,
        )
        tot = np.asarray(multihost_utils.process_allgather(vec)).sum(axis=0)
        return {k: tot[0, i] / max(tot[1, i], 1.0) for i, k in enumerate(keys)}


class Trainer:
    def __init__(self, task, hp: HParams, work_dir: Optional[str] = None):
        self.task = task
        self.hp = hp
        self.work_dir = work_dir or hp.get("work_dir") or "checkpoints/default"
        os.makedirs(self.work_dir, exist_ok=True)
        self.mesh = make_mesh(
            num_data=hp["mesh_shape"].get("data", -1),
            num_model=hp["mesh_shape"].get("model", 1),
        )
        self.ckpt = CheckpointManager(
            os.path.join(self.work_dir, "ckpt"),
            max_to_keep=hp["num_ckpt_keep"],
            save_best=hp.get("save_best", False),
        )
        self.global_step = 0
        self.is_main = jax.process_index() == 0
        self._tb = None
        # set by the SIGTERM/SIGINT handler installed around the fit
        # loop: save-and-exit at the next step boundary (pod preemption)
        self._preempted = False
        # persist the resolved config (reference hparams.py:98-101)
        if self.is_main:
            with open(os.path.join(self.work_dir, "config.json"), "w") as f:
                json.dump(hp.to_dict(), f, indent=2, default=str)
            if hp.get("save_codes", True):
                self._snapshot_code()

    def _snapshot_code(self):
        """Copy the package source into work_dir/codes/<timestamp> for
        reproducibility (reference base_task.py:252-257)."""
        import shutil
        import time

        src = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dst = os.path.join(
            self.work_dir, "codes", time.strftime("%Y%m%d%H%M%S")
        )
        if os.path.exists(dst):
            return
        try:
            shutil.copytree(
                src,
                os.path.join(dst, "bisinger_tpu"),
                ignore=shutil.ignore_patterns(
                    "__pycache__", "*.pyc", "*.so", "*.o"
                ),
            )
        except OSError:
            pass  # snapshot is best-effort

    # ---- logging ---------------------------------------------------------
    def _tb_writer(self):
        if self._tb is None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(self.work_dir, "tb"))
            except Exception:
                self._tb = False
        return self._tb or None

    def close(self):
        """Release the TB writer (and its event-file threads). Safe to
        call repeatedly; a later `log` lazily reopens the writer."""
        if self._tb:
            try:
                self._tb.close()
            except Exception:
                pass
        self._tb = None

    def log(self, metrics: Dict[str, float], prefix: str = "tr"):
        if not self.is_main:
            return
        msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
        print(f"| step {self.global_step} [{prefix}] {msg}", flush=True)
        tb = self._tb_writer()
        if tb:
            for k, v in metrics.items():
                tb.add_scalar(f"{prefix}/{k}", v, self.global_step)

    # ---- data ------------------------------------------------------------
    def build_dataloaders(self):
        hp = self.hp
        train_ds = M4SingerDataset(hp, hp["train_set_name"], shuffle=True)
        valid_ds = M4SingerDataset(hp, hp["valid_set_name"], shuffle=False)
        n_data = self.mesh.shape["data"]
        train_dl = DataLoader(
            train_ds, hp, shuffle=True, endless=True,
            batch_multiple=n_data,
            shard_index=jax.process_index(), num_shards=jax.process_count(),
        )
        valid_dl = DataLoader(
            valid_ds, hp, shuffle=False,
            max_tokens=hp["max_eval_tokens"] if hp["max_eval_tokens"] > 0 else hp["max_tokens"],
            max_sentences=max(hp["max_eval_sentences"], 1)
            if hp["max_eval_sentences"] > 0 else n_data,
            batch_multiple=n_data,
            shard_index=jax.process_index(), num_shards=jax.process_count(),
        )
        return train_dl, valid_dl

    # ---- loop ------------------------------------------------------------
    def fit(self, max_updates: Optional[int] = None):
        hp = self.hp
        max_updates = max_updates or hp["max_updates"]
        train_dl, valid_dl = self.build_dataloaders()
        if hasattr(self.task, "configure_accumulation"):
            # per-epoch grad-accum schedules need batches/epoch
            self.task.configure_accumulation(train_dl.batches_per_epoch())

        # async feeding: collate + device_put run on a background thread
        # (depth-2 bound) so batch prep overlaps the device step
        # (SURVEY §7.1). dataloader_prefetch=0 restores the synchronous
        # path; both feed identical batches in identical order.
        prep = lambda b: self._shard(device_batch(b))  # noqa: E731
        # device-resident corpus: upload every collated item ONCE and
        # gather batches on device (data/device_corpus.py) — removes the
        # per-step H2D upload (which the axon tunnel platform also leaks
        # host memory on) for corpora that fit in HBM
        device_corpus = bool(hp.get("device_resident_corpus"))
        if device_corpus:
            from bisinger_tpu.data.device_corpus import DeviceResidentFeeder

            feeder = DeviceResidentFeeder(
                train_dl.dataset, hp, self.mesh, seed=hp["seed"]
            )
            print(
                f"| device-resident corpus: {feeder.n_items} items, "
                f"{feeder.bytes_resident / 1e6:.0f} MB in HBM",
                flush=True,
            )
        depth = 0 if device_corpus else int(hp.get("dataloader_prefetch", 2) or 0)
        # where the H2D transfer is issued: "main" stages record fetch +
        # collate on the worker thread but calls device_put on the
        # consuming thread right before use. On the axon-tunnel platform
        # a worker-thread device_put contends with step dispatch on the
        # single RPC channel (measured -10% vs sync,
        # scripts/bench_pipeline.py 2026-08-18); host-side-only prefetch
        # keeps the collate overlap without the transfer contention.
        put_on = str(hp.get("dataloader_prefetch_put", "main"))
        prefetcher = None
        if depth > 0 and put_on == "worker":
            prefetcher = Prefetcher(iter(train_dl), depth=depth, transform=prep)
            train_iter = prefetcher
        elif depth > 0:
            prefetcher = Prefetcher(iter(train_dl), depth=depth)
            train_iter = map(prep, prefetcher)
        else:
            train_iter = map(prep, iter(train_dl))
        if device_corpus:
            train_iter = iter(feeder)
        # Preemption safety: TPU pods get a SIGTERM + grace window on
        # eviction. Trap it (and Ctrl-C) into a flag the step loop
        # checks, so the run checkpoints at the next step boundary and
        # exits cleanly instead of losing everything since the last
        # val_check_interval. Handlers only install on the main thread
        # (signal.signal raises elsewhere) and are restored after fit.
        import signal
        import threading

        prev_handlers = {}
        if threading.current_thread() is threading.main_thread():

            def _on_preempt(signum, frame):
                if not self._preempted:
                    print(
                        f"| caught signal {signum}: checkpointing at the "
                        "next step boundary, then exiting",
                        flush=True,
                    )
                self._preempted = True

            for sig in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[sig] = signal.signal(sig, _on_preempt)
        try:
            return self._fit_loop(max_updates, train_iter, valid_dl)
        finally:
            for sig, h in prev_handlers.items():
                signal.signal(sig, h)
            if prefetcher is not None:
                prefetcher.close()
            # flush + release the TB event-writer threads; long-lived
            # callers that log after fit() reopen lazily
            self.close()

    def _fit_loop(self, max_updates, train_iter, valid_dl):
        hp = self.hp
        rng = jax.random.PRNGKey(hp["seed"])
        first_batch = next(train_iter)  # already device-put + sharded
        with self.mesh:
            rng, init_rng = jax.random.split(rng)
            state = self.task.init_state(init_rng, first_batch)

            # resume
            restored = self.ckpt.restore(jax.device_get(state))
            if restored is not None:
                state = restored
                self.global_step = int(state.step)
                print(f"| resumed from step {self.global_step}", flush=True)
            elif hp.get("fs2_ckpt") and hasattr(self.task, "warm_start_fs2"):
                # fresh diffusion run: load the FFT-Singer stage-1
                # checkpoint into model.fs2 (reference
                # `usr/diffsinger_task.py:64-65`). Fail loudly — training
                # shallow diffusion on a random fs2 is the exact silent
                # failure this guards against.
                from bisinger_tpu.training.checkpoints import (
                    CheckpointManager as _CM,
                )

                fs2_dir = os.path.join(hp["fs2_ckpt"], "ckpt")
                if not os.path.isdir(fs2_dir):
                    raise FileNotFoundError(
                        f"fs2_ckpt={hp['fs2_ckpt']!r}: no checkpoint dir "
                        f"{fs2_dir!r} (train the FFT-Singer stage first, "
                        "or unset fs2_ckpt to train from scratch)"
                    )
                raw = _CM(fs2_dir).restore_raw()
                if raw is None:
                    raise FileNotFoundError(
                        f"fs2_ckpt dir {fs2_dir!r} contains no saved step"
                    )
                state = self.task.warm_start_fs2(state, raw["params"])
                print(
                    f"| warm-started fs2 from {hp['fs2_ckpt']}", flush=True
                )
            # replicate model/opt state across the mesh
            state = jax.device_put(state, replicate_sharding(self.mesh))

            # sanity validation
            if hp["num_sanity_val_steps"] > 0 and self.global_step == 0:
                self._run_validation(state, valid_dl, limit=hp["num_sanity_val_steps"], rng=rng)

            # metrics accumulate ON DEVICE (one tiny add per step) and are
            # fetched once per log window — a per-step device_get would
            # block the host on the TPU every step and serialize data
            # prep with device compute
            msum, mcount = None, 0
            t0, tcount = time.time(), 0
            pending = first_batch if self.global_step == 0 else None
            while self.global_step < max_updates:
                if pending is not None:
                    batch = pending
                    pending = None
                else:
                    batch = next(train_iter)  # pre-sharded by the feeder
                rng, step_rng = jax.random.split(rng)
                state, metrics = self.task.train_step(
                    state, batch, step_rng, **self._step_flags()
                )
                self.global_step += 1
                msum = (
                    metrics
                    if msum is None
                    else jax.tree_util.tree_map(lambda a, b: a + b, msum, metrics)
                )
                mcount += 1
                tcount += 1

                if self.global_step % hp["log_interval"] == 0:
                    fetched = jax.device_get(msum)
                    avg = {k: float(v) / mcount for k, v in fetched.items()}
                    avg["steps_per_s"] = tcount / max(time.time() - t0, 1e-9)
                    self.log(avg, "tr")
                    msum, mcount = None, 0
                    t0, tcount = time.time(), 0

                if self._preempted:
                    # preemption grace windows are short: skip validation,
                    # save immediately (val_loss sentinel keeps the
                    # keep-best tracker from ever electing this one), and
                    # let the resume path continue from here
                    if hp.get("save_ckpt", True):
                        self.ckpt.save(
                            self.global_step, jax.device_get(state),
                            metrics={"val_loss": 1e30},
                        )
                        print(
                            f"| preemption checkpoint saved at step "
                            f"{self.global_step}",
                            flush=True,
                        )
                    return state

                if self.global_step % hp["val_check_interval"] == 0:
                    val_loss = self._run_validation(state, valid_dl, rng=rng)
                    if hp.get("save_ckpt", True):
                        self.ckpt.save(
                            self.global_step, jax.device_get(state),
                            metrics={"val_loss": val_loss},
                        )
                    # exclude validation/checkpoint time from the next
                    # window's steps_per_s
                    t0, tcount = time.time(), 0
            # final checkpoint
            if hp.get("save_ckpt", True):
                val_loss = self._run_validation(state, valid_dl, rng=rng)
                self.ckpt.save(
                    self.global_step, jax.device_get(state),
                    metrics={"val_loss": val_loss},
                )
        return state

    def validate(self) -> float:
        """Restore the latest checkpoint and run one full validation pass
        (reference --validate flag)."""
        import jax.random as jrandom

        hp = self.hp
        train_dl, valid_dl = self.build_dataloaders()
        rng = jax.random.PRNGKey(hp["seed"])
        first_batch = device_batch(next(iter(train_dl)))
        with self.mesh:
            state = self.task.init_state(rng, self._shard(first_batch))
            restored = self.ckpt.restore(jax.device_get(state))
            if restored is None:
                raise FileNotFoundError(
                    f"no checkpoint under {self.work_dir!r} to validate"
                )
            state = restored
            self.global_step = int(state.step)
            print(f"| validating checkpoint at step {self.global_step}", flush=True)
            state = jax.device_put(state, replicate_sharding(self.mesh))
            return self._run_validation(state, valid_dl, rng=rng)

    def _step_flags(self) -> Dict[str, Any]:
        flags = getattr(self.task, "step_flags", None)
        return flags(self.global_step) if flags is not None else {}

    def _shard(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        """Single-host: device_put onto the mesh. Multi-host: each
        process feeds its own disjoint shard, assembled into the global
        array (`parallel.global_batch_from_process_local`)."""
        if jax.process_count() > 1:
            return global_batch_from_process_local(batch, self.mesh)
        return shard_batch(batch, self.mesh)

    def _run_validation(self, state, valid_dl, limit: Optional[int] = None, rng=None) -> float:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        meter = MeterDict()
        for i, batch in enumerate(valid_dl):
            if limit is not None and i >= limit:
                break
            batch = device_batch(batch)
            n = batch["txt_tokens"].shape[0]
            losses = self.task.val_step(
                state, self._shard(batch), rng, **self._step_flags()
            )
            meter.update(jax.device_get(losses), n)
            if i == 0:
                self._log_val_media(state, batch, rng)
        # global validation numbers (every rank participates; rank 0 logs)
        avg = meter.cross_process_averages()
        self.log(avg, "val")
        return avg.get("total_loss", float("inf"))

    def _log_val_media(self, state, batch, rng):
        """Per-validation mel/duration/f0 figures + vocoded audio of the
        first batch item (reference `fs2.py:368-433`,
        `diffspeech_task.py:113-122`). Best-effort: skipped without a TB
        writer, a matplotlib install, or an infer_step on the task."""
        # rank guard FIRST: non-main processes must not create TB writers
        # (event-file clutter on a shared work_dir)
        infer_step = getattr(self.task, "infer_step", None)
        if not self.is_main or infer_step is None:
            return
        tb = self._tb_writer()
        if tb is None:
            return
        try:
            # only item [0] is plotted/vocoded — slice the batch to one
            # row before sampling so the (expensive, full-NFE) diffusion
            # scan doesn't run over the whole validation batch. Host
            # arrays, no mesh sharding: this is a main-rank-local
            # computation with no collectives (a rank-0-only call into a
            # globally-sharded program would hang multi-host runs).
            one = {
                k: (v[:1] if isinstance(v, np.ndarray) and v.ndim >= 1 else v)
                for k, v in batch.items()
            }
            one["nsamples"] = 1
            if isinstance(one.get("item_names"), list):
                one["item_names"] = one["item_names"][:1]
            if hasattr(state, "batch_stats"):
                # PE-style task: infer_step(variables, mels) -> f0 preds
                # (eval-mode BatchNorm), no mel_out to plot — log the
                # f0 track comparison instead
                from bisinger_tpu.utils import plot
                from bisinger_tpu.utils.pitch import denorm_f0

                ret = infer_step(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    one["mels"],
                )
                f0_pred = np.asarray(
                    jax.device_get(ret["f0_denorm_pred"])
                )[0]
                f0_gt = np.asarray(
                    jax.device_get(
                        denorm_f0(
                            one["f0"], one.get("uv"),
                            self.hp["pitch_norm"],
                            use_uv=self.hp["use_uv"],
                        )
                    )
                )[0]
                tb.add_figure(
                    "val/pe_f0_0",
                    plot.f0_to_figure(f0_gt, f0_pred=f0_pred),
                    self.global_step,
                )
                return
            ret = infer_step(state.params, one, rng)
            mel_pred = np.asarray(jax.device_get(ret["mel_out"]))[0]
            mel_gt = np.asarray(batch["mels"])[0]
            from bisinger_tpu.utils import plot

            tb.add_figure(
                f"val/mel_{0}",
                plot.spec_compare_figure(mel_gt, mel_pred),
                self.global_step,
            )
            if "f0" in batch:
                f0_gt = np.asarray(batch["f0"])[0]
                tb.add_figure(
                    f"val/f0_{0}", plot.f0_to_figure(f0_gt), self.global_step
                )
            vocoder = getattr(self.task, "vocoder", None)
            if vocoder is not None:
                f0 = np.asarray(batch.get("f0", np.zeros(mel_pred.shape[0])))[0]
                wav = vocoder.spec2wav(mel_pred, f0)
                tb.add_audio(
                    f"val/wav_{0}", wav[None, :], self.global_step,
                    sample_rate=self.hp["audio_sample_rate"],
                )
        except Exception as e:  # media logging must never kill training
            print(f"| val media logging skipped: {e}", flush=True)
