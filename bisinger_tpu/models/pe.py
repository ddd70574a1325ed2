"""PitchExtractor (PE): mel -> f0/uv CNN, used to re-estimate f0 from
generated mels for the NSF vocoder.

Behavioural port of `train_bisinger/modules/fastspeech/pe.py:120-150`:
3-layer conv Prenet -> 2 residual ConvStacks -> 5-layer PitchPredictor
(odim=2 -> [f0_norm, uv_logit]); `f0_denorm_pred` applies denorm + uv
gating + padding mask.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from bisinger_tpu.config import HParams
from bisinger_tpu.models.common import compute_dtype
from bisinger_tpu.models.predictors import ConvStacks, PitchPredictor, Prenet
from bisinger_tpu.utils.pitch import denorm_f0


class PitchExtractor(nn.Module):
    hp: HParams
    n_mel_bins: int = 80
    conv_layers: int = 2

    @nn.compact
    def __call__(self, mel, deterministic=True):
        hp = self.hp
        hidden = 256
        predictor_hidden = (
            hp["predictor_hidden"] if hp["predictor_hidden"] > 0 else hidden
        )
        ret = {}
        # long-form mode: frame-sharded pitch extraction (parallel/sequence.py)
        from bisinger_tpu.parallel.sequence import constrain_time

        mel = constrain_time(mel, hp)
        dtype = compute_dtype(hp)
        x = Prenet(out_dim=hidden, dtype=dtype, name="mel_prenet")(
            mel, deterministic=deterministic
        )
        if self.conv_layers > 0:
            x = ConvStacks(
                n_layers=self.conv_layers, n_chans=hidden, odim=hidden,
                dtype=dtype, name="mel_encoder",
            )(x, deterministic=deterministic)
        pitch_pred = PitchPredictor(
            n_layers=5,
            n_chans=predictor_hidden,
            odim=2,
            kernel_size=hp["predictor_kernel"],
            dropout=0.5,
            padding=hp["ffn_padding"],
            dtype=dtype,
            name="pitch_predictor",
        )(x, deterministic=deterministic)
        ret["pitch_pred"] = pitch_pred

        pitch_padding = jnp.abs(mel).sum(-1) == 0
        use_uv = hp["pitch_type"] == "frame" and hp["use_uv"]
        uv = (pitch_pred[:, :, 1] > 0).astype(jnp.float32) if use_uv else None
        ret["f0_denorm_pred"] = denorm_f0(
            pitch_pred[:, :, 0],
            uv,
            hp["pitch_norm"],
            use_uv=hp["use_uv"],
            pitch_padding=pitch_padding,
        )
        return ret
