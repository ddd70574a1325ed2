"""Demo/serving app (reference inference/m4singer/gradio/infer.py)."""

import json
import urllib.request

import numpy as np

from bisinger_tpu.inference.server import (
    serve,
    split_score_chunks,
    synthesize_chunked,
    wav_bytes,
)


class FakeInfer:
    hp = {"audio_sample_rate": 24000}

    def infer_once(self, inp):
        return np.zeros(1000, np.float32)  # fixed length per chunk


def test_split_score_short_passthrough():
    inp = dict(text="a b", notes="C4 | D4", notes_duration="0.3 | 0.3")
    assert split_score_chunks(inp, max_words=4) == [inp]


def test_wav_bytes_header():
    b = wav_bytes(np.zeros(100, np.float32), 24000)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    assert len(b) == 44 + 200


def test_synthesize_chunked_concats():
    """Long scores split word-aligned: text, notes, and durations chunk
    together (regression: text-only chunking broke the word/notes
    pairing for every long request)."""
    n = 10
    inp = {
        "text": " ".join(["la"] * n),
        "notes": " | ".join(["C4"] * n),
        "notes_duration": " | ".join(["0.3"] * n),
    }
    chunks = split_score_chunks(inp, max_words=4)
    assert len(chunks) == 3
    for c in chunks:
        assert len(c["text"].split()) == len(c["notes"].split("|"))
        assert len(c["notes"].split("|")) == len(c["notes_duration"].split("|"))
    wav = synthesize_chunked(FakeInfer(), inp, max_words=4)
    assert len(wav) == 3 * 1000  # three chunks concatenated


def test_no_vocoder_rejected_over_http():
    """A pipeline returning a mel (no vocoder) must yield 400, never a
    spectrogram serialized as PCM."""
    import numpy as np
    import urllib.request

    class MelOnly:
        hp = {"audio_sample_rate": 24000}

        def infer_once(self, inp):
            return np.zeros((50, 80), np.float32)

    httpd = serve(MelOnly(), host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize",
            data=b'{"text": "la"}',
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 400 and b"vocoder" in e.read()
    finally:
        httpd.shutdown()


def test_http_roundtrip():
    httpd = serve(FakeInfer(), host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert json.loads(r.read())["status"] == "ok"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert b"BiSinger" in r.read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize",
            data=json.dumps({"text": "la la la"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            body = r.read()
            assert r.headers["Content-Type"] == "audio/wav"
            assert body[:4] == b"RIFF"
    finally:
        httpd.shutdown()


def test_http_error_surfaced():
    class Boom:
        hp = {"audio_sample_rate": 24000}

        def infer_once(self, inp):
            raise ValueError("word/note mismatch 3 vs 4")

    httpd = serve(Boom(), host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize",
            data=b'{"text": "x"}',
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            assert False, "should raise"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert b"mismatch" in e.read()
    finally:
        httpd.shutdown()
