"""Serving-path micro-batching (inference/server.py MicroBatcher):
concurrent requests must coalesce into one device program, long scores
must ride the same queue chunk-wise, and one malformed score must not
poison the batch it landed in."""

import json
import threading
import time
import urllib.request
import urllib.error

import numpy as np
import pytest

from bisinger_tpu.inference.server import MicroBatcher, serve


class SlowBatchInfer:
    """Counts infer_batch calls and their sizes; wav length encodes the
    request id so routing can be asserted."""

    hp = {"audio_sample_rate": 24000}

    def __init__(self, delay=0.05):
        self.calls = []
        self.delay = delay
        self.lock = threading.Lock()

    def infer_batch(self, inps):
        with self.lock:
            self.calls.append([i.get("rid", -1) for i in inps])
        time.sleep(self.delay)
        out = []
        for i in inps:
            if i.get("text") == "BOOM":
                raise ValueError("bad score")
            out.append(np.zeros(1000 + i.get("rid", 0), np.float32))
        return out


def test_concurrent_requests_coalesce():
    infer = SlowBatchInfer()
    mb = MicroBatcher(infer, max_batch=8, window_ms=80.0)
    try:
        results = {}

        def post(rid):
            results[rid] = mb.submit_score({"text": "la", "rid": rid})

        threads = [threading.Thread(target=post, args=(r,)) for r in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # every request answered, routed to the right caller
        for rid in range(6):
            assert len(results[rid]) == 1000 + rid
        # and they shared programs: fewer calls than requests, at least
        # one program carried >1 score
        assert len(infer.calls) < 6
        assert max(len(c) for c in infer.calls) > 1
        assert mb.batch_sizes == [len(c) for c in infer.calls]
    finally:
        mb.close()


def test_long_score_chunks_ride_the_queue():
    infer = SlowBatchInfer()
    mb = MicroBatcher(infer, max_batch=8, window_ms=30.0, max_words=4)
    try:
        n = 10  # -> 3 chunks at max_words=4
        wav = mb.submit_score(
            {
                "text": " ".join(["la"] * n),
                "notes": " | ".join(["C4"] * n),
                "notes_duration": " | ".join(["0.3"] * n),
            }
        )
        assert len(wav) == 3 * 1000  # three chunks concatenated
        assert sum(len(c) for c in infer.calls) == 3
    finally:
        mb.close()


def test_bad_score_does_not_poison_the_batch():
    infer = SlowBatchInfer()
    mb = MicroBatcher(infer, max_batch=8, window_ms=80.0)
    try:
        results, errors = {}, {}

        def post(rid, text):
            try:
                results[rid] = mb.submit_score({"text": text, "rid": rid})
            except Exception as e:
                errors[rid] = e

        threads = [
            threading.Thread(
                target=post, args=(r, "BOOM" if r == 1 else "la")
            )
            for r in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert set(errors) == {1}
        assert isinstance(errors[1], ValueError)
        for rid in (0, 2, 3):
            assert len(results[rid]) == 1000 + rid
    finally:
        mb.close()


def test_http_concurrent_batched_roundtrip():
    """Whole-stack: concurrent POSTs through the HTTP server coalesce in
    the batcher and every client gets its own wav back."""
    infer = SlowBatchInfer()
    httpd = serve(infer, port=0, max_batch=8, batch_window_ms=80.0)
    port = httpd.server_address[1]
    try:
        codes = {}

        def post(rid):
            body = json.dumps({"text": "la", "rid": rid}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/synthesize", data=body
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                data = r.read()
            # 44-byte RIFF header + int16 PCM of length 1000+rid
            codes[rid] = (len(data) - 44) // 2

        threads = [threading.Thread(target=post, args=(r,)) for r in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for rid in range(5):
            assert codes[rid] == 1000 + rid
        assert max(len(c) for c in infer.calls) > 1
    finally:
        httpd.shutdown()


def test_serial_mode_unchanged():
    """max_batch<=1 restores the lock-serialized legacy path (no batcher
    thread)."""
    from bisinger_tpu.inference.server import SVSRequestHandler

    class OnceOnly:
        hp = {"audio_sample_rate": 24000}

        def infer_once(self, inp):
            return np.zeros(100, np.float32)

    httpd = serve(OnceOnly(), port=0, max_batch=1)
    try:
        assert SVSRequestHandler.batcher is None
        port = httpd.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize",
            data=json.dumps({"text": "la"}).encode(),
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
    finally:
        httpd.shutdown()


def test_queue_bound_rejects_overload():
    """Admission beyond max_queue raises QueueFullError; earlier requests
    still complete (round-4 verdict #5: bounded admission)."""
    from bisinger_tpu.inference.server import QueueFullError

    infer = SlowBatchInfer(delay=0.3)
    # max_batch=1: worker drains one chunk at a time, so the queue holds
    # whatever the clients stack up
    mb = MicroBatcher(infer, max_batch=1, window_ms=0.0, max_queue=2)
    try:
        results, errors = {}, {}

        def post(rid):
            try:
                results[rid] = mb.submit_score({"rid": rid})
            except QueueFullError as e:
                errors[rid] = e

        threads = [threading.Thread(target=post, args=(r,)) for r in range(8)]
        for t in threads:
            t.start()
            time.sleep(0.02)  # deterministic arrival order
        for t in threads:
            t.join()
        assert errors, "overload never rejected"
        assert results, "every request rejected"
        assert len(results) + len(errors) == 8
        # accepted requests produced their own audio (rid-coded length)
        for rid, wav in results.items():
            assert len(wav) == 1000 + rid
    finally:
        mb.close()


def test_queue_bound_maps_to_http_503():
    infer = SlowBatchInfer(delay=0.4)
    # max_batch >= 2 so the batcher (the component that owns admission)
    # is in the path; the serial lock path has no queue to bound
    httpd = serve(
        infer, port=0, max_batch=2, batch_window_ms=0.0, max_queue=1
    )
    port = httpd.server_address[1]
    try:
        codes = []
        lock = threading.Lock()

        def post(rid):
            body = json.dumps({"rid": rid}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/synthesize", data=body,
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    with lock:
                        codes.append(r.status)
            except urllib.error.HTTPError as e:
                with lock:
                    codes.append(e.code)
                    if e.code == 503:
                        assert e.headers.get("Retry-After")

        threads = [threading.Thread(target=post, args=(r,)) for r in range(6)]
        for t in threads:
            t.start()
            time.sleep(0.02)
        for t in threads:
            t.join()
        assert 503 in codes and 200 in codes, codes
    finally:
        httpd.shutdown()


def test_unbounded_queue_accepts_everything():
    infer = SlowBatchInfer(delay=0.01)
    mb = MicroBatcher(infer, max_batch=1, window_ms=0.0, max_queue=0)
    try:
        for rid in range(20):
            assert len(mb.submit_score({"rid": rid})) == 1000 + rid
    finally:
        mb.close()
