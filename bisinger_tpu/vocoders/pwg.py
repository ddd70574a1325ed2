"""ParallelWaveGAN inference wrapper (reference `vocoders/pwg.py`):
z + mel -> wav, plus the canonical `wav2spec` used by all binarizers."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bisinger_tpu.config import HParams
from bisinger_tpu.models.pwg import ParallelWaveGANGenerator
from bisinger_tpu.utils import audio as audio_utils
from bisinger_tpu.vocoders.base_vocoder import BaseVocoder, register_vocoder


@register_vocoder
class PWG(BaseVocoder):
    def __init__(self, hp: HParams, params=None):
        self.hp = hp
        self.model = ParallelWaveGANGenerator(hp=hp)
        if params is None:
            t = 32
            z = jnp.zeros((1, t * hp["hop_size"]))
            mel = jnp.zeros((1, t, hp["audio_num_mel_bins"]))
            params = self.model.init(jax.random.PRNGKey(0), z, mel)["params"]
        self.params = params

    @functools.partial(jax.jit, static_argnums=0)
    def _forward(self, params, z, mel):
        return self.model.apply({"params": params}, z, mel)

    def spec2wav(self, mel, f0=None, rng=None):
        """mel [T, 80] -> wav [T*hop] (reference `PWG.spec2wav:84-105`)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        t = mel.shape[0]
        z = jax.random.normal(rng, (1, t * self.hp["hop_size"]))
        wav = self._forward(self.params, z, jnp.asarray(mel)[None])
        return np.asarray(wav[0], dtype=np.float32)

    # wav2spec inherited from BaseVocoder

    @staticmethod
    def wav2mfcc(wav_fn, hp: HParams):
        """wav -> [T, 39] MFCC+deltas (reference `PWG.wav2mfcc:126-139`)."""
        from bisinger_tpu.data.binarizer import load_wav
        from bisinger_tpu.vocoders.vocoder_utils import wav2mfcc

        wav = load_wav(wav_fn, hp["audio_sample_rate"]) if isinstance(wav_fn, str) else wav_fn
        return wav2mfcc(wav, hp)
