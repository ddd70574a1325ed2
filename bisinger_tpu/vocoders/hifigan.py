"""HiFi-GAN inference wrapper (reference `vocoders/hifigan.py:17-77`):
loads generator params from an orbax/npz checkpoint dir, jit-compiles
`spec2wav(mel, f0)` with NSF, and exposes the binarizer's `wav2spec`.

Also supports importing weights from a reference torch checkpoint
(`state_dict.model_gen` naming) for parity testing — see
`bisinger_tpu.vocoders.torch_import`.
"""

from __future__ import annotations

import functools
import glob
import os
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bisinger_tpu.config import HParams
from bisinger_tpu.models.hifigan import HifiGanGenerator
from bisinger_tpu.utils import audio as audio_utils
from bisinger_tpu.vocoders.base_vocoder import BaseVocoder, register_vocoder


@register_vocoder
class HifiGAN(BaseVocoder):
    def __init__(self, hp: HParams, params=None):
        self.hp = hp
        self.model = HifiGanGenerator(hp=hp)
        # multiband fast mode: the generator emits PQMF subbands at
        # sample_rate/n; synthesis back to full rate happens inside the
        # same jitted program (models/hifigan.py multiband note)
        from bisinger_tpu.models.pwg import pqmf_from_hparams

        self.pqmf = pqmf_from_hparams(hp)
        self.loaded = params is not None
        self.params = params if params is not None else self.load_params(hp)

    # ---- checkpoint loading ----------------------------------------------
    def load_params(self, hp: HParams):
        base_dir = hp.get("vocoder_ckpt", "")
        if base_dir and os.path.isdir(base_dir):
            def _step_of(p):
                # numeric sort: lexicographic order lies for mixed-width
                # step fields (e.g. generator_00004000 vs _000030000)
                m = re.search(r"generator_(\d+)\.npz$", p)
                return int(m.group(1)) if m else -1

            npz = sorted(
                glob.glob(os.path.join(base_dir, "generator_*.npz")),
                key=_step_of,
            )
            if npz:
                self.loaded = True
                return unflatten_params(dict(np.load(npz[-1], allow_pickle=False)))
        # fall back to random init (e.g. before vocoder training ran)
        t = 8
        mel = jnp.zeros((1, t, hp["audio_num_mel_bins"]))
        f0 = jnp.full((1, t), 220.0)
        variables = self.model.init(
            {"params": jax.random.PRNGKey(0), "nsf": jax.random.PRNGKey(1)}, mel, f0
        )
        return variables["params"]

    def save_params(self, step: int = 0):
        base_dir = self.hp["vocoder_ckpt"]
        os.makedirs(base_dir, exist_ok=True)
        flat = flatten_params(jax.device_get(self.params))
        np.savez(os.path.join(base_dir, f"generator_{step:09d}.npz"), **flat)

    # ---- inference --------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def _forward(self, params, mel, f0, rng):
        out = self.model.apply({"params": params}, mel, f0, rngs={"nsf": rng})
        return self.pqmf.synthesis(out) if self.pqmf is not None else out

    @functools.partial(jax.jit, static_argnums=0)
    def _forward_no_f0(self, params, mel):
        out = self.model.apply({"params": params}, mel)
        return self.pqmf.synthesis(out) if self.pqmf is not None else out

    def spec2wav_batch(self, mels, f0s=None, rng=None):
        """Batched [B, T, 80] (+ f0 [B, T]) -> wav [B, T*hop]: ONE device
        program for the whole batch (per-item exact-length calls would
        recompile per unique length)."""
        mels = jnp.asarray(mels)
        if f0s is not None and self.hp.get("use_nsf"):
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            wav = self._forward(self.params, mels, jnp.asarray(f0s), rng)
        else:
            wav = self._forward_no_f0(self.params, mels)
        out = np.asarray(wav, dtype=np.float32)
        if self.hp.get("use_denoise"):
            from bisinger_tpu.vocoders.vocoder_utils import denoise

            out = np.stack(
                [denoise(w, v=float(self.hp.get("denoise_v", 0.002)), hp=self.hp) for w in out]
            )
        return out

    def spec2wav(self, mel, f0=None, rng=None):
        """mel [T, 80] (+ f0 [T]) -> wav [T*hop] (reference
        `HifiGAN.spec2wav:55-69`)."""
        mel = jnp.asarray(mel)[None]
        if f0 is not None and self.hp.get("use_nsf"):
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            wav = self._forward(self.params, mel, jnp.asarray(f0)[None], rng)
        else:
            wav = self._forward_no_f0(self.params, mel)
        out = np.asarray(wav[0], dtype=np.float32)
        if self.hp.get("use_denoise"):
            from bisinger_tpu.vocoders.vocoder_utils import denoise

            out = denoise(out, v=float(self.hp.get("denoise_v", 0.002)), hp=self.hp)
        return out

    # wav2spec inherited from BaseVocoder


def flatten_params(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat):
    tree = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree
