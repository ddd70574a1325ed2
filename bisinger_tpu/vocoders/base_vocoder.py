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
    def wav2spec(wav_fn):
        raise NotImplementedError
