"""Vocoder registry (reference `vocoders/base_vocoder.py:1-41`): name ->
class registry plus dotted-path dynamic import."""

from __future__ import annotations

import importlib

VOCODERS = {}


def register_vocoder(cls):
    VOCODERS[cls.__name__.lower()] = cls
    VOCODERS[cls.__name__] = cls
    return cls


def get_vocoder_cls(hp):
    name = hp["vocoder"] if not isinstance(hp, str) else hp
    if name in VOCODERS:
        return VOCODERS[name]
    if "." in name:
        module, cls_name = name.rsplit(".", 1)
        importlib.import_module(module)
        if cls_name in VOCODERS:
            return VOCODERS[cls_name]
        return getattr(importlib.import_module(module), cls_name)
    return VOCODERS[name.lower()]


class BaseVocoder:
    def spec2wav(self, mel, **kwargs):
        raise NotImplementedError

    @staticmethod
    def wav2spec(wav_fn, hp):
        """Shared mel extraction (reference `vocoders/hifigan.py:70-82`
        and `pwg.py` ship identical copies; one implementation here)."""
        from bisinger_tpu.data.binarizer import load_wav
        from bisinger_tpu.utils import audio as audio_utils

        wav = (
            load_wav(wav_fn, hp["audio_sample_rate"])
            if isinstance(wav_fn, str)
            else wav_fn
        )
        return audio_utils.wav2spec(
            wav,
            sample_rate=hp["audio_sample_rate"],
            fft_size=hp["fft_size"],
            hop_size=hp["hop_size"],
            win_size=hp["win_size"],
            num_mels=hp["audio_num_mel_bins"],
            fmin=hp["fmin"],
            fmax=hp["fmax"],
            eps=float(hp.get("wav2spec_eps", 1e-6)),
        )
