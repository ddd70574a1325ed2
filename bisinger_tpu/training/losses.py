"""Training losses — functional jnp versions of the reference task losses
(`train_bisinger/tasks/tts/fs2.py:178-363`, `usr/diffsinger_task.py:518-564`,
`modules/commons/ssim.py:330-392`).

All reductions are masked and static-shape: the word-duration loss uses a
fixed-width segment-sum (`hp['max_words']`) instead of `word_id.max()+1`
scatter buffers.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bisinger_tpu.config import HParams
from bisinger_tpu.utils.seq import mel2ph_to_dur, segment_sum


# --------------------------------------------------------------------------
# mel losses
# --------------------------------------------------------------------------
def weights_nonzero_speech(target):
    """1.0 for frames with any energy, broadcast over mel bins
    (reference `tasks/tts/tts.py:123-127`)."""
    mask = (jnp.abs(target).sum(-1, keepdims=True) != 0).astype(target.dtype)
    return jnp.broadcast_to(mask, target.shape)


def mel_l1_loss(mel_out, target):
    w = weights_nonzero_speech(target)
    return (jnp.abs(mel_out - target) * w).sum() / jnp.maximum(w.sum(), 1.0)


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma ** 2)
    )
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(img1, img2, window_size: int = 11):
    """Per-pixel SSIM map over [B, T, M] 'images' (reference `_ssim`,
    `ssim.py:330-351`, channel=1). Implemented as one depthwise 2D conv
    via lax.conv_general_dilated."""
    win = jnp.asarray(_gaussian_window(window_size))[None, None]  # [1,1,k,k]
    pad = window_size // 2

    def filt(x):
        return jax.lax.conv_general_dilated(
            x[:, None],  # [B,1,T,M]
            win,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
        )[:, 0]

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


def mel_ssim_loss(mel_out, target, bias: float = 6.0):
    w = weights_nonzero_speech(target)
    ssim_map = ssim(mel_out + bias, target + bias)
    loss = (1.0 - ssim_map) * w
    return loss.sum() / jnp.maximum(w.sum(), 1.0)


def parse_mel_loss_spec(spec: str) -> Dict[str, float]:
    """'l1:0.5|ssim:0.5' -> {'l1': 0.5, 'ssim': 0.5} (reference
    `FastSpeech2Task.__init__`)."""
    out = {}
    for part in spec.split("|"):
        if ":" in part:
            name, lbd = part.split(":")
            out[name] = float(lbd)
        else:
            out[part] = 1.0
    return out


def add_mel_loss(mel_out, target, losses: Dict, hp: HParams, postfix: str = ""):
    for name, lbd in parse_mel_loss_spec(hp["mel_loss"]).items():
        if name == "l1":
            l = mel_l1_loss(mel_out, target)
        elif name == "ssim":
            l = mel_ssim_loss(mel_out, target)
        else:
            raise NotImplementedError(name)
        losses[f"{name}{postfix}"] = l * lbd


# --------------------------------------------------------------------------
# duration losses
# --------------------------------------------------------------------------
def add_dur_loss_midi(
    dur_pred_log,
    mel2ph,
    txt_tokens,
    word_boundary,
    losses: Dict,
    hp: HParams,
    crf_transitions=None,
):
    """Phone(log-MSE) + word(boundary segments) + sentence duration losses
    (reference `DiffSingerMIDITask.add_dur_loss`,
    `usr/diffsinger_task.py:518-564`). With dur_loss mog/crf the phone
    term becomes the proper NLL (the reference only ships the mse path
    for the MIDI tasks) and the scalar prediction used by the word/
    sentence terms comes from the head's decode."""
    t_txt = txt_tokens.shape[1]
    nonpadding = (txt_tokens != 0).astype(jnp.float32)
    dur_gt = mel2ph_to_dur(mel2ph, t_txt) * nonpadding

    dur_loss_type = hp.get("dur_loss", "mse")
    if dur_pred_log.ndim == 3 and dur_loss_type == "mog":
        from bisinger_tpu.models.predictors import mog_dur_nll, mog_expected_log_dur

        losses["pdur"] = (
            mog_dur_nll(dur_pred_log, dur_gt, mask=nonpadding) * hp["lambda_ph_dur"]
        )
        dur_pred = jnp.maximum(jnp.exp(mog_expected_log_dur(dur_pred_log)) - 1.0, 0.0)
    elif dur_pred_log.ndim == 3 and dur_loss_type == "crf":
        from bisinger_tpu.models.predictors import crf_log_likelihood

        # CRF states ARE frame counts, capped at n_states-1 = 31 frames
        # exactly like the reference's torchcrf head (tts_modules.py:102-105)
        # — suitable for speech; singing durations exceed it, so SVS
        # configs should keep dur_loss: mse
        n_states = dur_pred_log.shape[-1]
        tags = jnp.clip(dur_gt.astype(jnp.int32), 0, n_states - 1)
        ll = crf_log_likelihood(
            dur_pred_log, crf_transitions, tags, mask=nonpadding
        )
        denom = jnp.maximum(nonpadding.sum(), 1.0)
        losses["pdur"] = (-ll.sum() / denom) * hp["lambda_ph_dur"]
        # differentiable expectation over states for the word/sent terms
        probs = jax.nn.softmax(dur_pred_log, axis=-1)
        states = jnp.arange(n_states, dtype=jnp.float32)
        dur_pred = (probs * states).sum(-1)
    else:
        pdur = (dur_pred_log - jnp.log(dur_gt + 1.0)) ** 2
        losses["pdur"] = (
            (pdur * nonpadding).sum() / jnp.maximum(nonpadding.sum(), 1.0)
        ) * hp["lambda_ph_dur"]
        dur_pred = jnp.maximum(jnp.exp(dur_pred_log) - 1.0, 0.0)

    # word_boundary is only binarized for MIDI items; speech corpora
    # (TextGridBinarizer) have none — skip the word term rather than
    # crash (pdur + sdur still apply)
    if hp["lambda_word_dur"] > 0 and word_boundary is not None:
        wdb = word_boundary.astype(jnp.int32)
        idx = jnp.pad(jnp.cumsum(wdb, axis=1), ((0, 0), (1, 0)))[:, :-1]
        n_words = hp.get("max_words", 128)
        word_dur_p = segment_sum(dur_pred * nonpadding, idx, n_words)
        word_dur_g = segment_sum(dur_gt * nonpadding, idx, n_words)
        wdur = (jnp.log(word_dur_p + 1.0) - jnp.log(word_dur_g + 1.0)) ** 2
        word_nonpadding = (word_dur_g > 0).astype(jnp.float32)
        losses["wdur"] = (
            (wdur * word_nonpadding).sum() / jnp.maximum(word_nonpadding.sum(), 1.0)
        ) * hp["lambda_word_dur"]

    if hp["lambda_sent_dur"] > 0:
        sent_p = (dur_pred * nonpadding).sum(-1)
        sent_g = dur_gt.sum(-1)
        sdur = jnp.mean((jnp.log(sent_p + 1.0) - jnp.log(sent_g + 1.0)) ** 2)
        losses["sdur"] = sdur * hp["lambda_sent_dur"]


def add_dur_loss_sil(
    dur_pred_log, mel2ph, txt_tokens, is_sil, losses: Dict, hp: HParams
):
    """Plain FastSpeech2Task variant: words delimited by silence phones
    (`tasks/tts/fs2.py:213-259`). `is_sil` [B, T_txt] float."""
    t_txt = txt_tokens.shape[1]
    nonpadding = (txt_tokens != 0).astype(jnp.float32)
    dur_gt = mel2ph_to_dur(mel2ph, t_txt) * nonpadding

    pdur = (dur_pred_log - jnp.log(dur_gt + 1.0)) ** 2
    losses["pdur"] = (
        (pdur * nonpadding).sum() / jnp.maximum(nonpadding.sum(), 1.0)
    ) * hp["lambda_ph_dur"]
    dur_pred = jnp.maximum(jnp.exp(dur_pred_log) - 1.0, 0.0)

    if hp["lambda_word_dur"] > 0:
        word_id = (jnp.cumsum(is_sil, axis=-1) * (1 - is_sil)).astype(jnp.int32)
        n_words = hp.get("max_words", 128)
        # bucket 0 collects silences; dropped like the reference's [:, 1:]
        word_dur_p = segment_sum(dur_pred, word_id, n_words)[:, 1:]
        word_dur_g = segment_sum(dur_gt, word_id, n_words)[:, 1:]
        wdur = (jnp.log(word_dur_p + 1.0) - jnp.log(word_dur_g + 1.0)) ** 2
        word_nonpadding = (word_dur_g > 0).astype(jnp.float32)
        losses["wdur"] = (
            (wdur * word_nonpadding).sum() / jnp.maximum(word_nonpadding.sum(), 1.0)
        ) * hp["lambda_word_dur"]
    if hp["lambda_sent_dur"] > 0:
        sent_p = dur_pred.sum(-1)
        sent_g = dur_gt.sum(-1)
        sdur = jnp.mean((jnp.log(sent_p + 1.0) - jnp.log(sent_g + 1.0)) ** 2)
        losses["sdur"] = sdur * hp["lambda_sent_dur"]


# --------------------------------------------------------------------------
# pitch / energy losses
# --------------------------------------------------------------------------
def binary_cross_entropy_with_logits(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def add_f0_loss(pitch_pred, f0, uv, nonpadding, losses: Dict, hp: HParams):
    """Frame-level f0 L1 (voiced only) + uv BCE (reference
    `tasks/tts/fs2.py:330-349`)."""
    if hp["use_uv"]:
        uv_loss = binary_cross_entropy_with_logits(pitch_pred[:, :, 1], uv)
        losses["uv"] = (
            (uv_loss * nonpadding).sum() / jnp.maximum(nonpadding.sum(), 1.0)
        ) * hp["lambda_uv"]
        nonpadding = nonpadding * (uv == 0).astype(jnp.float32)
    f0_pred = pitch_pred[:, :, 0]
    if hp["pitch_loss"] in ("l1", "l2"):
        err = (
            jnp.abs(f0_pred - f0)
            if hp["pitch_loss"] == "l1"
            else (f0_pred - f0) ** 2
        )
        losses["f0"] = (
            (err * nonpadding).sum() / jnp.maximum(nonpadding.sum(), 1.0)
        ) * hp["lambda_f0"]
    else:
        raise NotImplementedError(hp["pitch_loss"])


def add_pitch_loss(output: Dict, sample: Dict, losses: Dict, hp: HParams):
    if hp["pitch_type"] == "cwt":
        # reference `tasks/tts/fs2.py:289-320`
        nonpadding = (sample["mel2ph"] != 0).astype(jnp.float32)
        cwt_pred = output["cwt"][:, :, :10]
        cwt_gt = sample["cwt_spec"]
        if hp["cwt_loss"] == "l1":
            losses["C"] = jnp.abs(cwt_pred - cwt_gt).mean() * hp["lambda_f0"]
        elif hp["cwt_loss"] == "l2":
            losses["C"] = jnp.mean((cwt_pred - cwt_gt) ** 2) * hp["lambda_f0"]
        else:
            # fail loudly: silently skipping 'C' would train the CWT
            # pitch decoder with no supervision at all
            raise NotImplementedError(f"cwt_loss: {hp['cwt_loss']}")
        if hp["use_uv"]:
            uv_pred = output["cwt"][:, :, -1]
            uv_loss = binary_cross_entropy_with_logits(uv_pred, sample["uv"])
            losses["uv"] = (
                (uv_loss * nonpadding).sum() / jnp.maximum(nonpadding.sum(), 1.0)
            ) * hp["lambda_uv"]
        losses["f0_mean"] = (
            jnp.abs(output["f0_mean"] - sample["f0_mean"]).mean() * hp["lambda_f0"]
        )
        losses["f0_std"] = (
            jnp.abs(output["f0_std"] - sample["f0_std"]).mean() * hp["lambda_f0"]
        )
        return
    if hp["pitch_type"] == "ph":
        nonpadding = (sample["txt_tokens"] != 0).astype(jnp.float32)
        err = jnp.abs(output["pitch_pred"][:, :, 0] - sample["f0"])
        losses["f0"] = (
            (err * nonpadding).sum() / jnp.maximum(nonpadding.sum(), 1.0)
        ) * hp["lambda_f0"]
        return
    nonpadding = (sample["mel2ph"] != 0).astype(jnp.float32)
    add_f0_loss(
        output["pitch_pred"], sample["f0"], sample["uv"], nonpadding, losses, hp
    )


def add_energy_loss(energy_pred, energy, losses: Dict, hp: HParams):
    nonpadding = (energy != 0).astype(jnp.float32)
    loss = ((energy_pred - energy) ** 2 * nonpadding).sum() / jnp.maximum(
        nonpadding.sum(), 1.0
    )
    losses["e"] = loss * hp["lambda_energy"]
