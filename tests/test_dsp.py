import numpy as np
import pytest

import jax.numpy as jnp

from bisinger_tpu.ops.stft import log_mel_spectrogram
from bisinger_tpu.utils import audio
from bisinger_tpu.utils.pitch import (
    denorm_f0,
    f0_to_coarse,
    f0_to_coarse_np,
    norm_f0,
    norm_interp_f0_np,
)
from bisinger_tpu.utils.seq import (
    gather_phoneme_states,
    length_regulator,
    make_positions,
    mel2ph_to_dur,
    segment_sum,
)


class TestMel:
    def test_mel_basis_matches_librosa_reference_values(self):
        # golden values computed with librosa.filters.mel(24000, 512, 80, 30, 12000)
        basis = audio.mel_basis(24000, 512, 80, 30, 12000)
        assert basis.shape == (80, 257)
        # every filter sums to ~2/(width) normalization; all non-negative
        assert (basis >= 0).all()
        # triangles tile the band: most freq columns within [fmin,fmax] covered
        col_sums = basis.sum(axis=0)
        freqs = np.linspace(0, 12000, 257)
        inband = (freqs > 100) & (freqs < 11500)
        assert (col_sums[inband] > 0).all()

    def test_stft_frame_count(self):
        wav = np.random.RandomState(0).randn(24000).astype(np.float32)
        spc = audio.stft_magnitude(wav, 512, 128, 512)
        # librosa center=True: 1 + floor(N/hop) frames
        assert spc.shape == (257, 1 + 24000 // 128)

    def test_wav2spec_contract(self):
        wav = np.random.RandomState(0).randn(12000).astype(np.float32) * 0.1
        wav_out, mel = audio.wav2spec(wav)
        assert mel.shape[1] == 80
        assert len(wav_out) == mel.shape[0] * 128
        assert np.isfinite(mel).all()
        # silence floors at log10(eps) = -6
        silent_mel = audio.wav2spec(np.zeros(12000, np.float32))[1]
        np.testing.assert_allclose(silent_mel, -6.0, atol=1e-5)

    def test_device_mel_matches_host(self):
        wav = np.random.RandomState(1).randn(6400).astype(np.float32) * 0.3
        _, mel_host = audio.wav2spec(wav)
        mel_dev = np.asarray(log_mel_spectrogram(jnp.asarray(wav)))
        assert mel_dev.shape[0] >= mel_host.shape[0]
        # host path accumulates in float64, device in float32: ~2e-3 in log10
        np.testing.assert_allclose(
            mel_dev[: mel_host.shape[0]], mel_host, atol=5e-3
        )


class TestPitch:
    def test_f0_to_coarse_matches_numpy(self):
        f0 = np.array([0.0, 55.0, 110.0, 440.0, 750.0, 1050.0], np.float32)
        c_np = f0_to_coarse_np(f0)
        c_j = np.asarray(f0_to_coarse(jnp.asarray(f0)))
        np.testing.assert_array_equal(c_np, c_j)
        assert c_np.min() >= 1 and c_np.max() <= 255

    def test_norm_denorm_roundtrip(self):
        f0 = jnp.asarray([100.0, 200.0, 440.0])
        normed = norm_f0(f0, None, "log")
        denormed = denorm_f0(normed, None, "log")
        np.testing.assert_allclose(np.asarray(denormed), np.asarray(f0), rtol=1e-5)

    def test_norm_interp_fills_unvoiced(self):
        f0 = np.array([0, 0, 100, 0, 400, 0, 0], np.float32)
        f0i, uv = norm_interp_f0_np(f0)
        assert uv.tolist() == [1, 1, 0, 1, 0, 1, 1]
        assert np.isfinite(f0i).all()
        # interior gap linearly interpolated in log2 domain
        expected_mid = (np.log2(100) + np.log2(400)) / 2
        np.testing.assert_allclose(f0i[3], expected_mid, rtol=1e-5)


class TestSeq:
    def test_length_regulator_matches_reference_example(self):
        # reference docstring example (tts_modules.py:162-172)
        dur = jnp.asarray([[2, 2, 3]])
        mel2ph = length_regulator(dur, max_frames=9)
        assert mel2ph.tolist() == [[1, 1, 2, 2, 3, 3, 3, 0, 0]]

    def test_length_regulator_with_padding(self):
        dur = jnp.asarray([[2, 2, 3]])
        pad = jnp.asarray([[0, 0, 1]])
        mel2ph = length_regulator(dur, dur_padding=pad, max_frames=6)
        assert mel2ph.tolist() == [[1, 1, 2, 2, 0, 0]]

    def test_mel2ph_to_dur_roundtrip(self):
        dur = jnp.asarray([[2, 0, 3, 1]])
        mel2ph = length_regulator(dur, max_frames=8)
        dur_back = mel2ph_to_dur(mel2ph, 4)
        assert dur_back.astype(int).tolist() == [[2, 0, 3, 1]]

    def test_segment_sum(self):
        vals = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
        ids = jnp.asarray([[0, 1, 1, 2]])
        out = segment_sum(vals, ids, 3)
        assert out.tolist() == [[1.0, 5.0, 4.0]]

    def test_segment_sum_drops_overflow(self):
        vals = jnp.asarray([[1.0, 2.0]])
        ids = jnp.asarray([[0, 99]])
        out = segment_sum(vals, ids, 2)
        assert out.tolist() == [[1.0, 0.0]]

    def test_gather_phoneme_states(self):
        enc = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
        mel2ph = jnp.asarray([[1, 1, 3, 0]])
        out = gather_phoneme_states(enc, mel2ph)
        assert out[0, 0].tolist() == [0.0, 1.0]
        assert out[0, 2].tolist() == [4.0, 5.0]
        assert out[0, 3].tolist() == [0.0, 0.0]  # padding -> zeros

    def test_make_positions(self):
        toks = jnp.asarray([[5, 6, 7, 0, 0]])
        pos = make_positions(toks)
        assert pos.tolist() == [[1, 2, 3, 0, 0]]


def test_integrated_loudness_and_normalize():
    """BS.1770-style loudness (reference uses pyloudnorm,
    data_gen_utils.py:45-47): normalizing hits the target within 0.1 LU
    and louder input measures louder."""
    import numpy as np

    from bisinger_tpu.utils.audio import integrated_loudness, loudness_normalize

    sr = 24000
    t = np.arange(sr * 2) / sr
    quiet = (0.05 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    loud = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    assert integrated_loudness(loud, sr) > integrated_loudness(quiet, sr) + 15
    out = loudness_normalize(quiet, sr, target_lufs=-22.0)
    assert abs(integrated_loudness(out, sr) + 22.0) < 0.1
    # clipping protection
    hot = loudness_normalize(quiet, sr, target_lufs=0.0)
    assert np.abs(hot).max() <= 1.0


def test_trim_long_silences():
    """Energy-VAD silence collapse (reference trim_long_silences:29-92):
    leading/trailing silence shrinks, voiced samples survive."""
    import numpy as np

    from bisinger_tpu.utils.audio import trim_long_silences

    sr = 24000
    t = np.arange(sr) / sr
    voiced = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    sig = np.concatenate([np.zeros(sr), voiced, np.zeros(sr)]).astype(np.float32)
    trimmed, mask = trim_long_silences(sig, sr)
    assert len(trimmed) < len(sig)
    assert len(trimmed) >= len(voiced)  # no voiced samples lost
    assert mask[sr + sr // 2]  # middle of the voiced span kept
