"""Streaming synthesis (inference/server.py): long scores stream
chunk-by-chunk over HTTP chunked transfer, with first audio after the
first score chunk instead of after the whole score. The reference's
gradio app (`inference/m4singer/gradio/infer.py:36-60`) chops long
scores the same way but only returns the fully concatenated wav."""

import json
import struct
import threading
import time
import urllib.error
import urllib.request

import numpy as np

from bisinger_tpu.inference.server import (
    MicroBatcher,
    pcm16_bytes,
    serve,
    wav_stream_header,
)


class SlowChunkInfer:
    """Each chunk takes `delay` seconds; wav encodes the chunk's word
    count so ordering/content can be asserted."""

    hp = {"audio_sample_rate": 24000}

    def __init__(self, delay=0.15):
        self.delay = delay
        self.calls = []
        self.lock = threading.Lock()

    def _one(self, inp):
        n_words = len(inp.get("text", "").split())
        return np.full(100 * n_words, 0.25, np.float32)

    def infer_batch(self, inps):
        with self.lock:
            self.calls.append(len(inps))
        time.sleep(self.delay)
        return [self._one(i) for i in inps]

    def infer_once(self, inp):
        with self.lock:
            self.calls.append(1)
        time.sleep(self.delay)
        return self._one(inp)


def _long_score(n=10):
    return {
        "text": " ".join(["la"] * n),
        "notes": " | ".join(["C4"] * n),
        "notes_duration": " | ".join(["0.3"] * n),
    }


def test_stream_score_first_chunk_early_and_bit_identical():
    infer = SlowChunkInfer(delay=0.2)
    mb = MicroBatcher(infer, max_batch=8, window_ms=10.0, max_words=4)
    try:
        t0 = time.monotonic()
        arrivals, pieces = [], []
        for wav in mb.stream_score(_long_score(10)):  # chunks: 4+4+2 words
            arrivals.append(time.monotonic() - t0)
            pieces.append(wav)
        # three chunks, in score order (length encodes word count)
        assert [len(p) for p in pieces] == [400, 400, 200]
        # chunk 0 arrived while the tail was still synthesizing: the head
        # program (1 item) finishes one full `delay` before the tail's
        # batched program does
        assert arrivals[-1] - arrivals[0] > 0.1, arrivals
        # head ran alone; the tail coalesced into one batched program
        assert infer.calls[0] == 1
        assert sum(infer.calls) <= 1 + 2
        # bit-identical to the non-streamed path
        ref = mb.submit_score(_long_score(10))
        np.testing.assert_array_equal(np.concatenate(pieces), ref)
    finally:
        mb.close()


def test_stream_score_single_chunk_score():
    infer = SlowChunkInfer(delay=0.01)
    mb = MicroBatcher(infer, max_batch=4, window_ms=5.0, max_words=64)
    try:
        pieces = list(mb.stream_score({"text": "la la", "notes": "C4 | C4",
                                       "notes_duration": "0.3 | 0.3"}))
        assert len(pieces) == 1 and len(pieces[0]) == 200
    finally:
        mb.close()


def _parse_streamed_wav(data: bytes):
    """Split a streamed WAV blob into (header, pcm)."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    riff_size = struct.unpack("<I", data[4:8])[0]
    data_size = struct.unpack("<I", data[40:44])[0]
    assert riff_size == 0xFFFFFFFF and data_size == 0xFFFFFFFF
    return data[:44], data[44:]


def test_wav_stream_header_matches_static_header_layout():
    hdr = wav_stream_header(24000)
    assert len(hdr) == 44
    _parse_streamed_wav(hdr + b"")


def test_http_streaming_roundtrip_batched_and_serial():
    """Whole-stack: {"stream": true} POST returns chunked audio/wav whose
    PCM equals the non-streamed response's PCM; works with and without
    the micro-batcher."""
    for max_batch in (8, 1):
        infer = SlowChunkInfer(delay=0.05)
        httpd = serve(
            infer, port=0, max_batch=max_batch, batch_window_ms=10.0,
            max_words=4,
        )
        port = httpd.server_address[1]
        try:
            score = _long_score(10)

            def post(body):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/synthesize",
                    data=json.dumps(body).encode(),
                )
                return urllib.request.urlopen(req, timeout=30)

            with post({**score, "stream": True}) as r:
                assert r.status == 200
                assert r.headers.get("Transfer-Encoding") == "chunked"
                assert r.headers.get("Content-Type") == "audio/wav"
                streamed = r.read()
            _, pcm = _parse_streamed_wav(streamed)

            with post(score) as r:
                plain = r.read()
            assert pcm == plain[44:]  # identical PCM payload
        finally:
            httpd.shutdown()


def test_http_streaming_first_bytes_before_stream_end():
    """Time-to-first-audio: with 3 slow chunks, the header + first chunk
    PCM must be readable well before the last chunk finishes."""
    infer = SlowChunkInfer(delay=0.4)
    httpd = serve(
        infer, port=0, max_batch=8, batch_window_ms=10.0, max_words=4
    )
    port = httpd.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize",
            data=json.dumps({**_long_score(10), "stream": True}).encode(),
        )
        t0 = time.monotonic()
        with urllib.request.urlopen(req, timeout=30) as r:
            first = r.read(44 + 800)  # header + chunk-0 PCM (400 int16)
            t_first = time.monotonic() - t0
            rest = r.read()
            t_all = time.monotonic() - t0
        assert len(first) == 44 + 800
        # first audio strictly earlier than the full stream (tail program
        # takes another `delay` after the head)
        assert t_first < t_all - 0.2, (t_first, t_all)
        assert len(rest) == 2 * (400 + 200)
    finally:
        httpd.shutdown()


def test_streaming_error_before_first_byte_is_a_400():
    class Boom:
        hp = {"audio_sample_rate": 24000}

        def infer_once(self, inp):
            raise ValueError("bad score")

    httpd = serve(Boom(), port=0, max_batch=1)
    port = httpd.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize",
            data=json.dumps({"text": "la", "stream": True}).encode(),
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert b"bad score" in e.read()
    finally:
        httpd.shutdown()
