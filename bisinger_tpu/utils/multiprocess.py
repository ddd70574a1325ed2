"""Ordered chunked multiprocess map.

Behavioural equivalent of the reference's `chunked_multiprocess_run`
(`train_bisinger/utils/multiprocess_utils.py:19-47`): fan a job list out
over N worker processes in round-robin chunks, yielding results strictly
in input order while workers run ahead. Used by the binarizer to
parallelize per-utterance feature extraction.

Falls back to inline execution for num_workers <= 1 (and in daemonic
contexts where fork is unavailable).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import traceback
from typing import Any, Callable, Iterable, Iterator, List, Sequence, Tuple


def _worker(fn, jobs_q, results_q):
    # NOTE: this env write is best-effort only — BLAS/OpenMP thread
    # pools were typically initialized in the PARENT before fork, so the
    # effective pin happens in run.py, which sets OMP_NUM_THREADS before
    # numpy is first imported (mirroring reference base_binarizer.py:3)
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    while True:
        job = jobs_q.get()
        if job is None:
            return
        idx, args = job
        try:
            results_q.put((idx, fn(*args), None))
        except Exception:
            results_q.put((idx, None, traceback.format_exc()))


def chunked_multiprocess_run(
    fn: Callable,
    args_list: Sequence[Tuple],
    num_workers: int = 0,
    ordered: bool = True,
) -> Iterator[Any]:
    """Yield fn(*args) for each args in order. num_workers=0 -> cpu count
    (capped at 8, like the reference's N_PROC default)."""
    if num_workers == 0:
        num_workers = int(os.environ.get("N_PROC", min(os.cpu_count() or 1, 8)))
    n = len(args_list)
    if num_workers <= 1 or n <= 1 or mp.current_process().daemon:
        # inline: single worker, single job, or a daemonic parent
        # (daemonic processes may not spawn children)
        for args in args_list:
            yield fn(*args)
        return

    ctx = mp.get_context("fork")
    jobs_q = ctx.Queue()
    # bounded like the reference's per-worker queues (q_max_size=1000,
    # `multiprocess_utils.py`): without a bound, workers buffer every
    # multi-MB feature dict ahead of the (disk-bound) consumer
    results_q = ctx.Queue(maxsize=1000)
    workers = [
        ctx.Process(target=_worker, args=(fn, jobs_q, results_q), daemon=True)
        for _ in range(min(num_workers, n))
    ]
    for w in workers:
        w.start()
    for i, args in enumerate(args_list):
        jobs_q.put((i, args))
    for _ in workers:
        jobs_q.put(None)

    try:
        if ordered:
            buf = {}
            next_idx = 0
            for _ in range(n):
                idx, res, err = results_q.get()
                if err is not None:
                    raise RuntimeError(f"worker failed on item {idx}:\n{err}")
                buf[idx] = res
                while next_idx in buf:
                    yield buf.pop(next_idx)
                    next_idx += 1
        else:
            for _ in range(n):
                idx, res, err = results_q.get()
                if err is not None:
                    raise RuntimeError(f"worker failed on item {idx}:\n{err}")
                yield res
    finally:
        for w in workers:
            w.join(timeout=5)
            if w.is_alive():
                w.terminate()
