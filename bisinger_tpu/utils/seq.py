"""Sequence/alignment ops: duration <-> frame maps, static-shape segment sums.

TPU-native replacements for the reference's dynamic-shape alignment code:

  - `length_regulator`: dur [B,T_txt] -> mel2ph [B,T_mel] with a *static*
    T_mel (the reference computes `dur.sum(-1).max()` dynamically,
    `modules/fastspeech/tts_modules.py:156-191`; here the frame budget is a
    compile-time constant and overflow frames are dropped/masked).
  - `mel2ph_to_dur`: frame map -> per-phone durations via one-hot matmul
    segment-sum (replaces `scatter_add`, `tts_modules.py:244-250`).
  - `segment_sum`: masked fixed-width scatter-add used by the word-duration
    loss (`tasks/tts/fs2.py:246-259`) without `word_id.max()+1` dynamic
    shapes.

All functions are jit-safe with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def length_regulator(dur, dur_padding=None, alpha: float = 1.0, max_frames: int = None):
    """Expand phone durations into a frame->phone index map.

    dur: [B, T_txt] int/float durations.
    dur_padding: [B, T_txt] 1 where padded (dropped), or None.
    max_frames: static output length T_mel (required under jit).
    Returns mel2ph [B, max_frames] int32; 0 = padding, else phone index + 1.

    Same cumsum/mask contract as the reference LengthRegulator
    (`tts_modules.py:161-191`), with a static frame budget.
    """
    assert max_frames is not None, "max_frames must be static"
    assert alpha > 0
    dur = jnp.round(dur.astype(jnp.float32) * alpha).astype(jnp.int32)
    if dur_padding is not None:
        dur = dur * (1 - dur_padding.astype(jnp.int32))
    token_idx = jnp.arange(1, dur.shape[1] + 1)[None, :, None]  # [1, T_txt, 1]
    dur_cumsum = jnp.cumsum(dur, axis=1)  # [B, T_txt]
    dur_cumsum_prev = jnp.pad(dur_cumsum, ((0, 0), (1, 0)))[:, :-1]
    pos_idx = jnp.arange(max_frames)[None, None, :]  # [1, 1, T_mel]
    token_mask = (pos_idx >= dur_cumsum_prev[:, :, None]) & (
        pos_idx < dur_cumsum[:, :, None]
    )
    mel2ph = (token_idx * token_mask.astype(jnp.int32)).sum(axis=1)
    return mel2ph


def mel2ph_to_dur(mel2ph, t_txt: int, max_dur: int = None):
    """mel2ph [B, T_mel] -> per-phone frame counts [B, t_txt].

    One-hot matmul segment-sum — MXU-friendly, no scatter
    (replaces `tts_modules.py:244-250`).
    """
    one_hot = jax.nn.one_hot(mel2ph, t_txt + 1, dtype=jnp.float32)  # [B, T_mel, T+1]
    dur = one_hot.sum(axis=1)[:, 1:]  # drop the padding bucket
    if max_dur is not None:
        dur = jnp.minimum(dur, max_dur)
    return dur


def segment_sum(values, segment_ids, num_segments: int):
    """Masked fixed-width scatter-add: values [B, T] summed into
    [B, num_segments] buckets by segment_ids [B, T] (ids >= num_segments are
    dropped). One-hot matmul, static shapes."""
    ids = jnp.where(segment_ids < num_segments, segment_ids, num_segments)
    one_hot = jax.nn.one_hot(ids, num_segments + 1, dtype=values.dtype)  # [B,T,S+1]
    out = jnp.einsum("bt,bts->bs", values, one_hot)
    return out[:, :num_segments]


def gather_phoneme_states(encoder_out, mel2ph):
    """Frame-align encoder states: encoder_out [B, T_txt, H], mel2ph
    [B, T_mel] -> [B, T_mel, H]. mel2ph==0 maps to zeros (the reference
    F.pad + gather trick, `modules/fastspeech/fs2.py:131-134`)."""
    padded = jnp.pad(encoder_out, ((0, 0), (1, 0), (0, 0)))
    return jnp.take_along_axis(padded, mel2ph[:, :, None], axis=1)


def make_positions(tokens, padding_idx: int = 0):
    """Position ids starting at padding_idx+1, padding gets padding_idx
    (reference `utils/__init__.py:146-158`)."""
    mask = (tokens != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx
