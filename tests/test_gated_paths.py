"""Exercise the optional-dependency paths (VERDICT r2 #9) with injected
fakes: the webrtcvad-convention silence trimmer and the gradio UI
wiring both run their real code with a stub module standing in for the
absent package, so the gated branches are executed, not just skipped."""

import sys
import types

import numpy as np
import pytest

SR = 24000


# ---------------------------------------------------------------------------
# webrtcvad-convention trim_long_silences
# ---------------------------------------------------------------------------
class _FakeVad:
    """Energy-threshold stand-in with webrtcvad's exact interface: 16-bit
    little-endian PCM bytes in, bool out."""

    def __init__(self, mode):
        assert mode == 3  # the reference's aggressiveness setting
        self.calls = 0

    def is_speech(self, pcm_bytes, sample_rate):
        assert sample_rate == 16000
        self.calls += 1
        arr = np.frombuffer(pcm_bytes, "<i2").astype(np.float32) / 32768.0
        return bool(np.sqrt((arr ** 2).mean()) > 0.01)


@pytest.fixture
def fake_webrtcvad(monkeypatch):
    mod = types.ModuleType("webrtcvad")
    mod.Vad = _FakeVad
    monkeypatch.setitem(sys.modules, "webrtcvad", mod)
    return mod


def _speech_silence_speech():
    rng = np.random.RandomState(0)
    t = np.arange(SR, dtype=np.float32) / SR
    tone = 0.3 * np.sin(2 * np.pi * 220 * t)
    silence = np.zeros(2 * SR, np.float32)  # 2 s: far beyond the 12-window cap
    return np.concatenate([tone, silence, tone]), len(tone), len(silence)


def test_webrtc_path_collapses_long_silence(fake_webrtcvad):
    from bisinger_tpu.utils.audio import trim_long_silences

    wav, n_tone, n_sil = _speech_silence_speech()
    trimmed, mask = trim_long_silences(wav, SR)
    assert mask.shape == wav.shape
    # both speech spans survive (minus window-quantization edges)
    assert mask[: n_tone - SR // 10].mean() > 0.95
    assert mask[n_tone + n_sil + SR // 10 :].mean() > 0.9
    # the 2 s silence collapses to <= dilation width (12+1 windows of
    # 30 ms at 16 kHz stretched back to 24 kHz ~ 0.6 s per side)
    sil = mask[n_tone : n_tone + n_sil]
    assert sil.mean() < 0.75
    assert len(trimmed) == int(mask.sum())


def test_webrtc_path_runs_the_vad_over_every_window(fake_webrtcvad):
    from bisinger_tpu.utils import audio as audio_mod

    called = {}
    orig = fake_webrtcvad.Vad

    class Spy(orig):
        def __init__(self, mode):
            super().__init__(mode)
            called["vad"] = self

    fake_webrtcvad.Vad = Spy
    wav, _, _ = _speech_silence_speech()
    audio_mod.trim_long_silences(wav, SR)
    # 4 s at 16 kHz / 480-sample windows = ~133 windows
    assert called["vad"].calls > 100


def test_energy_fallback_still_works(monkeypatch):
    """Without webrtcvad the energy VAD produces an equivalent trim."""
    monkeypatch.setitem(sys.modules, "webrtcvad", None)
    # sys.modules[name] = None makes `import webrtcvad` raise ImportError
    from bisinger_tpu.utils.audio import trim_long_silences

    wav, n_tone, n_sil = _speech_silence_speech()
    trimmed, mask = trim_long_silences(wav, SR)
    assert mask[: n_tone - SR // 10].mean() > 0.95
    assert mask[n_tone : n_tone + n_sil].mean() < 0.75


# ---------------------------------------------------------------------------
# gradio UI wiring
# ---------------------------------------------------------------------------
class _StubInfer:
    hp = {"audio_sample_rate": SR}

    def infer_once(self, inp):
        assert inp["text"] and inp["notes"]
        return np.zeros(SR // 10, np.float32)


def test_launch_gradio_wires_the_ui(monkeypatch):
    captured = {}

    class Interface:
        def __init__(self, fn, inputs, outputs, title):
            captured["fn"] = fn
            captured["title"] = title

        def launch(self, **kwargs):
            captured["launch_kwargs"] = kwargs
            return "launched"

    mod = types.ModuleType("gradio")
    mod.Interface = Interface
    mod.Audio = lambda: "audio-widget"
    monkeypatch.setitem(sys.modules, "gradio", mod)

    from bisinger_tpu.inference.server import launch_gradio

    out = launch_gradio(_StubInfer(), share=False)
    assert out == "launched"
    assert captured["launch_kwargs"] == {"share": False}
    # the callback drives the real chunked-synthesis path
    sr, wav = captured["fn"]("SP ni hao", "rest | C4 | D4", "0.1 | 0.3 | 0.3", "Alto-1")
    assert sr == SR and len(wav) == SR // 10


def test_launch_gradio_clean_error_without_gradio(monkeypatch):
    monkeypatch.setitem(sys.modules, "gradio", None)
    from bisinger_tpu.inference.server import launch_gradio

    with pytest.raises(RuntimeError, match="gradio is not installed"):
        launch_gradio(_StubInfer())
