"""Behavioral accuracy tests for the built-in Praat-AC pitch tracker
(`bisinger_tpu/utils/praat_pitch.py`).

The reference binarizes f0 with parselmouth's `to_pitch_ac`
(`data_gen_utils.py:152-173`); parselmouth is absent in this
environment, so these tests pin the own-implementation tracker to the
*behaviour* that matters for training data quality: Hz accuracy on
harmonic signals, octave stability under strong even harmonics, voicing
decisions on silence/noise, and contour smoothness (no octave jumps)
on vibrato — exactly the failure modes the old quick-and-dirty
autocorrelation fallback exhibited.
"""

import numpy as np
import pytest

from bisinger_tpu.utils.praat_pitch import praat_frame_grid, praat_pitch_ac

SR = 24000
TIME_STEP = 128 / 24000  # the reference chain's hop-aligned step


def harmonic(f0_contour, sr=SR, amps=(1.0, 0.6, 0.4, 0.25), seed=0):
    """Synthesize sum of harmonics following a per-sample f0 contour."""
    phase = 2 * np.pi * np.cumsum(f0_contour) / sr
    x = sum(a * np.sin((k + 1) * phase) for k, a in enumerate(amps))
    rng = np.random.RandomState(seed)
    return (x + 0.01 * rng.randn(len(x))).astype(np.float64)


def gpe(f0_est, f0_true_frames, tol=0.2):
    """Gross pitch error on frames voiced in both (fraction > tol off)."""
    both = (f0_est > 0) & (f0_true_frames > 0)
    assert both.sum() > 10
    rel = np.abs(f0_est[both] - f0_true_frames[both]) / f0_true_frames[both]
    return float((rel > tol).mean()), float(
        np.abs(f0_est[both] - f0_true_frames[both]).mean()
    )


def true_frames(f0_contour, n_frames, t1):
    centers = np.round((t1 + np.arange(n_frames) * TIME_STEP) * SR).astype(int)
    centers = np.clip(centers, 0, len(f0_contour) - 1)
    return f0_contour[centers]


def test_steady_tone_accuracy():
    f0c = np.full(SR * 2, 220.0)
    f0 = praat_pitch_ac(harmonic(f0c), SR, TIME_STEP)
    n, t1, _ = praat_frame_grid(len(f0c), SR, TIME_STEP, 80.0)
    assert len(f0) == n
    g, mae = gpe(f0, true_frames(f0c, n, t1))
    assert g == 0.0
    assert mae < 1.0  # parabolic-interp precision on a clean tone
    assert (f0 > 0).mean() > 0.9


def test_vibrato_tracks_and_never_octave_jumps():
    t = np.arange(SR * 2) / SR
    f0c = 200.0 + 30.0 * np.sin(2 * np.pi * 5.5 * t)  # 5.5 Hz vibrato
    f0 = praat_pitch_ac(harmonic(f0c, seed=1), SR, TIME_STEP)
    n, t1, _ = praat_frame_grid(len(f0c), SR, TIME_STEP, 80.0)
    g, mae = gpe(f0, true_frames(f0c, n, t1))
    assert g == 0.0
    assert mae < 3.0
    v = f0[f0 > 0]
    jumps = np.abs(np.diff(np.log2(v)))
    assert jumps.max() < 0.5, "octave jump inside a smooth vibrato"


def test_strong_second_harmonic_keeps_fundamental():
    """Energy dominated by the 2nd harmonic must not halve/double f0 —
    the octave-cost + normalized-AC machinery at work."""
    f0c = np.full(int(SR * 1.5), 160.0)
    x = harmonic(f0c, amps=(0.25, 1.0, 0.15), seed=2)
    f0 = praat_pitch_ac(x, SR, TIME_STEP)
    n, t1, _ = praat_frame_grid(len(f0c), SR, TIME_STEP, 80.0)
    g, _ = gpe(f0, true_frames(f0c, n, t1))
    assert g == 0.0


def test_silence_and_noise_unvoiced():
    rng = np.random.RandomState(3)
    assert (praat_pitch_ac(np.zeros(SR), SR, TIME_STEP) == 0).all()
    noise = 0.1 * rng.randn(SR)
    assert (praat_pitch_ac(noise, SR, TIME_STEP) > 0).mean() < 0.2


def test_tone_in_silence_voicing_boundaries():
    """Voiced segment surrounded by silence: voicing flags localize it."""
    f0c = np.full(SR, 260.0)
    tone = harmonic(f0c, seed=4)
    pad = np.zeros(SR // 2)
    x = np.concatenate([pad, tone, pad])
    f0 = praat_pitch_ac(x, SR, TIME_STEP)
    n, t1, _ = praat_frame_grid(len(x), SR, TIME_STEP, 80.0)
    centers = t1 + np.arange(n) * TIME_STEP
    inside = (centers > 0.55) & (centers < 1.45)
    outside = (centers < 0.4) | (centers > 1.6)
    assert (f0[inside] > 0).mean() > 0.95
    assert (f0[outside] == 0).mean() > 0.95
    assert abs(np.median(f0[inside][f0[inside] > 0]) - 260.0) < 2.0


def test_praat_beats_quick_autocorr_on_singing_like_signal():
    """The reason this tracker exists: on a singing-like sweep with
    amplitude modulation, the Viterbi/octave-cost tracker must be at
    least as octave-stable as the old argmax fallback, and accurate."""
    from bisinger_tpu.config import HParams
    from bisinger_tpu.data.binarizer import (
        extract_f0_autocorr,
        extract_f0_praat_ac,
    )

    t = np.arange(SR * 3) / SR
    # glide 140 -> 330 Hz with vibrato and tremolo
    f0c = 140.0 * (330.0 / 140.0) ** (t / t[-1]) + 8.0 * np.sin(
        2 * np.pi * 6 * t
    )
    x = harmonic(f0c, amps=(0.5, 1.0, 0.7, 0.3), seed=5)
    x *= 0.6 + 0.4 * np.sin(2 * np.pi * 2.0 * t) ** 2  # tremolo
    hp = HParams({"hop_size": 128, "audio_sample_rate": SR})
    n_frames = len(x) // 128
    f0_praat = extract_f0_praat_ac(x, n_frames, hp)
    f0_quick = extract_f0_autocorr(x, n_frames, hp)
    # frame alignment of the praat path: frames shifted by lpad (8)
    n, t1, _ = praat_frame_grid(len(x), SR, TIME_STEP, 80.0)
    truth = np.zeros(n_frames)
    tf = true_frames(f0c, n, t1)
    truth[8 : 8 + len(tf)] = tf[: max(0, n_frames - 8)]
    g_p, mae_p = gpe(f0_praat, truth)
    assert g_p < 0.02
    assert mae_p < 5.0
    # the quick tracker aligns frames directly (no praat grid shift)
    truth_q = f0c[(np.arange(n_frames) * 128).clip(0, len(f0c) - 1)]
    g_q, _ = gpe(f0_quick, truth_q)
    assert g_p <= g_q + 1e-9


def test_binarizer_fallback_uses_praat(monkeypatch):
    """With parselmouth absent, extract_f0 must route to the Praat-AC
    implementation (not the quick autocorr)."""
    import builtins

    from bisinger_tpu.config import HParams
    from bisinger_tpu.data import binarizer as B

    real_import = builtins.__import__

    def no_parselmouth(name, *a, **k):
        if name == "parselmouth":
            raise ImportError("blocked for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_parselmouth)
    hp = HParams({"hop_size": 128, "audio_sample_rate": SR})
    f0c = np.full(SR, 220.0)
    x = harmonic(f0c)
    got = B.extract_f0(x, len(x) // 128, hp)
    expect = B.extract_f0_praat_ac(x, len(x) // 128, hp)
    np.testing.assert_allclose(got, expect)


# ---- harder, real-voice-shaped fixtures (round-4 verdict #7) -------------
# No Praat/parselmouth binary exists in-env to pin bit-level vectors
# against (closure note in PARITY.md), so these encode the failure modes
# real voices exhibit: creaky low f0, breathy onsets, amplitude fades,
# and the 80/750 Hz rails.


def jittered(f0c, jitter=0.01, shimmer=0.25, seed=6, amps=(1.0, 0.7, 0.5, 0.3)):
    """Creak-like source: per-period frequency jitter + amplitude
    shimmer on top of the harmonic stack."""
    rng = np.random.RandomState(seed)
    n = len(f0c)
    # slowly-varying multiplicative jitter (~per-period rate at low f0)
    knots = rng.randn(max(8, n // 256)) * jitter
    jit = 1.0 + np.interp(np.arange(n), np.linspace(0, n - 1, len(knots)), knots)
    x = harmonic(f0c * jit, amps=amps, seed=seed)
    sh_knots = 1.0 + shimmer * rng.randn(max(8, n // 512))
    sh = np.interp(np.arange(n), np.linspace(0, n - 1, len(sh_knots)), sh_knots)
    return x * np.clip(sh, 0.3, 1.7)


def test_low_f0_creak_near_floor():
    """90 Hz creaky phonation (jitter + shimmer) just above the 80 Hz
    floor: the tracker must neither halve (impossible, below floor) nor
    double; GPE stays small."""
    f0c = np.full(SR * 2, 90.0)
    x = jittered(f0c, jitter=0.015, shimmer=0.3)
    f0 = praat_pitch_ac(x, SR, TIME_STEP)
    n, t1, _ = praat_frame_grid(len(f0c), SR, TIME_STEP, 80.0)
    g, mae = gpe(f0, true_frames(f0c, n, t1))
    assert g < 0.02, f"gross errors {g}"
    assert mae < 4.0
    v = f0[f0 > 0]
    assert (v > 150.0).mean() < 0.02, "octave doubling on creak"


def test_breathy_onset():
    """Aspiration noise fading into voicing (breathy attack): the voiced
    steady state must be tracked; the noise-only head must not produce
    spurious strongly-voiced frames at a wrong pitch."""
    rng = np.random.RandomState(7)
    n_breath, n_voice = SR // 2, SR
    f0c = np.full(n_voice, 210.0)
    voiced = harmonic(f0c, seed=7)
    # crossfade: noise dominant -> harmonic dominant over the first 0.25 s
    fade = np.linspace(0.0, 1.0, SR // 4)
    head = 0.25 * rng.randn(n_breath)
    head[-len(fade):] *= (1 - fade) * 2.0
    tail_head = voiced[: len(fade)] * fade
    x = np.concatenate([head[: -len(fade)],
                        head[-len(fade):] + tail_head,
                        voiced[len(fade):]])
    f0 = praat_pitch_ac(x, SR, TIME_STEP)
    n, t1, _ = praat_frame_grid(len(x), SR, TIME_STEP, 80.0)
    centers = t1 + np.arange(n) * TIME_STEP
    steady = centers > 0.75  # well inside the voiced region
    head_only = centers < 0.3
    v_steady = f0[steady]
    assert (v_steady > 0).mean() > 0.95
    assert abs(np.median(v_steady[v_steady > 0]) - 210.0) < 3.0
    assert (f0[head_only] > 0).mean() < 0.3, "breath noise voiced"


def test_amplitude_fade_stays_voiced_and_accurate():
    """A long decrescendo (20 dB fade): voicing must persist deep into
    the fade and the pitch must not drift — the local-intensity window
    fix (ADVICE r4) is what keeps the unvoiced candidate honest here."""
    f0c = np.full(SR * 2, 180.0)
    t = np.arange(len(f0c)) / SR
    x = harmonic(f0c, seed=8) * 10 ** (-20 * (t / t[-1]) / 20)
    f0 = praat_pitch_ac(x, SR, TIME_STEP)
    n, t1, _ = praat_frame_grid(len(f0c), SR, TIME_STEP, 80.0)
    centers = t1 + np.arange(n) * TIME_STEP
    deep = (centers > 1.2) & (centers < 1.9)  # -12..-19 dB region
    v = f0[deep]
    assert (v > 0).mean() > 0.9, "fade lost voicing too early"
    assert abs(np.median(v[v > 0]) - 180.0) < 2.0


def test_f0_at_the_rails():
    """82 Hz (just above floor) and 700 Hz (near ceiling) must both
    track without collapsing to the rail or octave-erring."""
    for f_target, tol_hz in ((82.0, 2.0), (700.0, 8.0)):
        f0c = np.full(SR * 2, f_target)
        x = harmonic(f0c, amps=(1.0, 0.5, 0.2), seed=9)
        f0 = praat_pitch_ac(x, SR, TIME_STEP)
        n, t1, _ = praat_frame_grid(len(f0c), SR, TIME_STEP, 80.0)
        g, mae = gpe(f0, true_frames(f0c, n, t1))
        assert g == 0.0, f"gross errors at {f_target} Hz"
        assert mae < tol_hz, (f_target, mae)


def test_block_streaming_is_exact():
    """The memory-bounded block path (ADVICE r4: stream frames through
    the FFT stages) must be bit-identical to one-shot processing."""
    t = np.arange(SR * 3) / SR
    f0c = 150.0 + 60.0 * np.sin(2 * np.pi * 0.7 * t)
    x = harmonic(f0c, seed=10) * (0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t) ** 2)
    full = praat_pitch_ac(x, SR, TIME_STEP, block_frames=1 << 30)
    small = praat_pitch_ac(x, SR, TIME_STEP, block_frames=37)
    np.testing.assert_array_equal(full, small)
