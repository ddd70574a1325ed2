"""Host-side audio DSP: STFT, mel filterbank, wav<->spec.

Numerically mirrors the reference frontend
(`train_bisinger/data_gen/tts/data_gen_utils.py:95-149` +
`train_bisinger/utils/audio.py:29-48`) without depending on librosa:

  - STFT: center-padded (``n_fft//2`` both sides, constant 0), periodic Hann
    window, magnitude spectrogram;
  - mel basis: Slaney-scale filterbank with Slaney area normalization
    (librosa defaults);
  - mel: ``log10(max(eps, mel_basis @ |STFT|))``;
  - wav is end-padded to a whole number of frames
    (``librosa_pad_lr`` convention) and truncated to ``T_mel * hop``.

The device-side (jnp/Pallas) mirror lives in `bisinger_tpu.ops.stft`.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np


def hann_window(win_size: int) -> np.ndarray:
    """Periodic Hann window (scipy `get_window('hann', n, fftbins=True)`)."""
    n = np.arange(win_size)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mels)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=8)
def mel_basis(
    sample_rate: int, fft_size: int, num_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape [num_mels, fft//2+1].

    Matches `librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)` defaults
    (htk=False, norm='slaney') as used at
    `data_gen/tts/data_gen_utils.py:130-132`.
    """
    n_freqs = fft_size // 2 + 1
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_min, mel_max = _hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax)
    mel_pts = np.linspace(mel_min, mel_max, num_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2 : num_mels + 2] - hz_pts[:num_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def stft_complex(
    wav: np.ndarray, fft_size: int, hop_size: int, win_size: int
) -> np.ndarray:
    """Complex STFT, shape [fft//2+1, T]. librosa conventions:
    center=True, pad_mode='constant', periodic Hann, window zero-padded
    to n_fft when win_size < fft_size. Single implementation — the
    magnitude path and the vocoder denoiser share the framing
    convention so they cannot drift."""
    window = hann_window(win_size)
    if win_size < fft_size:
        lpad = (fft_size - win_size) // 2
        window = np.pad(window, (lpad, fft_size - win_size - lpad))
    y = np.pad(wav.astype(np.float64), (fft_size // 2, fft_size // 2), mode="constant")
    n_frames = 1 + (len(y) - fft_size) // hop_size
    idx = np.arange(fft_size)[None, :] + hop_size * np.arange(n_frames)[:, None]
    frames = y[idx] * window[None, :]
    return np.fft.rfft(frames, n=fft_size, axis=1).T


def stft_magnitude(
    wav: np.ndarray, fft_size: int, hop_size: int, win_size: int
) -> np.ndarray:
    """Magnitude STFT, shape [fft//2+1, T] (see stft_complex)."""
    return np.abs(stft_complex(wav, fft_size, hop_size, win_size)).astype(
        np.float32
    )


def librosa_pad_lr(x: np.ndarray, fsize: int, fshift: int, pad_sides: int = 1):
    """End-padding so the wav covers a whole number of frames
    (reference `utils/audio.py:39-48`)."""
    assert pad_sides in (1, 2)
    pad = (x.shape[0] // fshift + 1) * fshift - x.shape[0]
    if pad_sides == 1:
        return 0, pad
    return pad // 2, pad // 2 + pad % 2


def wav2spec(
    wav: np.ndarray,
    sample_rate: int = 24000,
    fft_size: int = 512,
    hop_size: int = 128,
    win_size: int = 512,
    num_mels: int = 80,
    fmin: float = 30,
    fmax: float = 12000,
    eps: float = 1e-6,
) -> Tuple[np.ndarray, np.ndarray]:
    """wav [N] -> (wav_padded [T*hop], log10-mel [T, num_mels]).

    The canonical feature extraction used by all binarizers (reference
    `vocoders/pwg.py:107-124` -> `data_gen_utils.py:95-149`).
    """
    spc = stft_magnitude(wav, fft_size, hop_size, win_size)
    basis = mel_basis(sample_rate, fft_size, num_mels, fmin, fmax)
    mel = basis @ spc
    mel = np.log10(np.maximum(eps, mel))

    l_pad, r_pad = librosa_pad_lr(wav, fft_size, hop_size, 1)
    wav = np.pad(wav, (l_pad, r_pad), mode="constant")
    wav = wav[: mel.shape[1] * hop_size]
    return wav, mel.T.astype(np.float32)


def save_wav(wav: np.ndarray, path: str, sr: int, norm: bool = False):
    from scipy.io import wavfile

    wav = np.asarray(wav, dtype=np.float32)
    if norm and np.abs(wav).max() > 0:
        wav = wav / np.abs(wav).max()
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))


# --------------------------------------------------------------------------
# loudness normalization + VAD silence trimming
# --------------------------------------------------------------------------
def _k_weighting_sos(sr: int):
    """BS.1770 K-weighting as two biquads (high-shelf + high-pass),
    coefficients re-derived for arbitrary sample rate (the standard
    tables are 48 kHz; pyloudnorm uses the same bilinear design)."""
    import math

    # stage 1: spherical-head high shelf
    db = 3.999843853973347
    f0 = 1681.974450955533
    q = 0.7071752369554196
    k = math.tan(math.pi * f0 / sr)
    vh = 10 ** (db / 20.0)
    vb = vh ** 0.4996667741545416
    a0 = 1.0 + k / q + k * k
    b1 = [(vh + vb * k / q + k * k) / a0, 2.0 * (k * k - vh) / a0,
          (vh - vb * k / q + k * k) / a0]
    a1 = [1.0, 2.0 * (k * k - 1.0) / a0, (1.0 - k / q + k * k) / a0]
    # stage 2: high-pass
    f0 = 38.13547087602444
    q = 0.5003270373238773
    k = math.tan(math.pi * f0 / sr)
    den = 1.0 + k / q + k * k
    a2 = [1.0, 2.0 * (k * k - 1.0) / den, (1.0 - k / q + k * k) / den]
    b2 = [1.0, -2.0, 1.0]
    return (b1, a1), (b2, a2)


def integrated_loudness(wav: np.ndarray, sr: int) -> float:
    """Gated integrated loudness in LUFS (BS.1770-4, mono; behavioural
    stand-in for pyloudnorm's Meter — reference `data_gen_utils.py:45-47,
    117-121`)."""
    from scipy.signal import lfilter

    (b1, a1), (b2, a2) = _k_weighting_sos(sr)
    x = lfilter(b1, a1, wav.astype(np.float64))
    x = lfilter(b2, a2, x)
    block = int(0.4 * sr)
    hop = int(0.1 * sr)
    if len(x) < block:
        ms = np.mean(x ** 2) + 1e-12
        return -0.691 + 10.0 * np.log10(ms)
    n_blocks = 1 + (len(x) - block) // hop
    idx = np.arange(block)[None, :] + hop * np.arange(n_blocks)[:, None]
    ms = np.mean(x[idx] ** 2, axis=1) + 1e-12
    lk = -0.691 + 10.0 * np.log10(ms)
    # absolute gate -70 LUFS, then relative gate -10 LU
    keep = lk > -70.0
    if not keep.any():
        return -70.0
    rel = -0.691 + 10.0 * np.log10(np.mean(ms[keep])) - 10.0
    keep &= lk > rel
    if not keep.any():
        return -70.0
    return -0.691 + 10.0 * np.log10(np.mean(ms[keep]))


def loudness_normalize(wav: np.ndarray, sr: int, target_lufs: float = -22.0) -> np.ndarray:
    """Scale to target LUFS, clipping-protected (reference
    `process_utterance:117-121`)."""
    lufs = integrated_loudness(wav, sr)
    gain = 10.0 ** ((target_lufs - lufs) / 20.0)
    out = wav * gain
    peak = np.abs(out).max()
    if peak > 1.0:
        out = out / peak
    return out.astype(np.float32)


def trim_long_silences(
    wav: np.ndarray,
    sr: int,
    vad_max_silence_length: int = 12,
    window_ms: int = 30,
    moving_average_width: int = 8,
):
    """Collapse long silences (reference `trim_long_silences`,
    `data_gen_utils.py:29-92`). Returns (trimmed, mask).

    When webrtcvad is importable the reference convention runs verbatim
    (16 kHz resample, 16-bit PCM windows through `Vad(mode=3)`, centered
    moving-average smoothing, voiced-region dilation); otherwise an
    energy VAD approximates the voice flags with the same smoothing and
    dilation pipeline."""
    from scipy.ndimage import binary_dilation

    try:  # pragma: no cover - exercised via an injected fake in tests
        import webrtcvad
    except ImportError:
        webrtcvad = None
    if webrtcvad is not None and len(wav):
        return _trim_long_silences_webrtc(
            wav, sr, webrtcvad, vad_max_silence_length, window_ms,
            moving_average_width,
        )

    spw = (window_ms * sr) // 1000
    n_win = len(wav) // spw
    if n_win == 0:
        return wav, np.ones(len(wav), bool)
    frames = wav[: n_win * spw].reshape(n_win, spw)
    rms = np.sqrt(np.mean(frames ** 2, axis=1) + 1e-12)
    above = rms[rms > np.percentile(rms, 20)]
    if above.size == 0:
        # near-constant energy (e.g. digital silence): every window ties
        # the percentile; median of the empty slice would be nan and the
        # mask would go all-False, returning an EMPTY waveform — keep
        # the input unchanged instead
        return wav, np.ones(len(wav), bool)
    thresh = max(1e-4, 0.1 * float(np.median(above)))
    flags = (rms > thresh).astype(float)

    width = moving_average_width
    smoothed = np.convolve(flags, np.ones(width) / width, mode="same")
    mask_w = np.round(smoothed).astype(bool)
    mask_w = binary_dilation(mask_w, np.ones(vad_max_silence_length + 1, bool))
    mask = np.repeat(mask_w, spw)
    mask = np.concatenate([mask, np.ones(len(wav) - len(mask), bool)])
    return wav[mask], mask


def _trim_long_silences_webrtc(
    wav, sr, webrtcvad, vad_max_silence_length, window_ms, moving_average_width
):
    """The reference's exact VAD convention (`data_gen_utils.py:38-92`):
    resample to 16 kHz, run `webrtcvad.Vad(mode=3)` over 30 ms 16-bit PCM
    windows, centered moving-average smoothing, dilate voiced regions,
    stretch the mask back to the input rate."""
    import struct
    from fractions import Fraction

    from scipy.ndimage import binary_dilation
    from scipy.signal import resample_poly

    vad_sr = 16000
    if sr != vad_sr:
        frac = Fraction(vad_sr, sr)
        wav16 = resample_poly(wav, frac.numerator, frac.denominator)
    else:
        wav16 = wav
    spw = (window_ms * vad_sr) // 1000
    wav16 = wav16[: len(wav16) - len(wav16) % spw]
    if len(wav16) == 0:
        return wav, np.ones(len(wav), bool)

    pcm = struct.pack(
        "%dh" % len(wav16),
        *np.round(np.clip(wav16, -1.0, 1.0) * 32767).astype(np.int16),
    )
    vad = webrtcvad.Vad(mode=3)
    flags = np.array(
        [
            vad.is_speech(pcm[s * 2 : (s + spw) * 2], sample_rate=vad_sr)
            for s in range(0, len(wav16), spw)
        ],
        dtype=float,
    )

    # centered moving average (reference `data_gen_utils.py:77-84`)
    width = moving_average_width
    padded = np.concatenate(
        [np.zeros((width - 1) // 2), flags, np.zeros(width // 2)]
    )
    csum = np.cumsum(padded, dtype=float)
    csum[width:] = csum[width:] - csum[:-width]
    mask_w = np.round(csum[width - 1 :] / width).astype(bool)
    mask_w = binary_dilation(mask_w, np.ones(vad_max_silence_length + 1, bool))

    mask16 = np.repeat(mask_w, spw)
    # stretch the 16 kHz mask back onto the input waveform (reference
    # uses skimage resize; nearest-index mapping is equivalent for a
    # boolean mask)
    pos = np.minimum(
        (np.arange(len(wav)) * vad_sr) // sr, len(mask16) - 1
    ).astype(int)
    mask = mask16[pos] > 0
    return wav[mask], mask
