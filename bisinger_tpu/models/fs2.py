"""FastSpeech2 and FastSpeech2MIDI (FFT-Singer) acoustic models.

Behavioural port of `train_bisinger/modules/fastspeech/fs2.py` and
`modules/diffsinger_midi/fs2.py` to flax.linen with static shapes:

  - encoder embeds = scaled token emb + midi emb + midi-dur emb + slur emb
    + ESM(token-emb, lang-emb) (`diffsinger_midi/fs2.py:19-39`)
  - style embedding (speech/singing/pseudo-singing) added ONLY to the
    decoder input, never the duration predictor (`fs2.py:157-189`)
  - `predictor_grad` scales the gradient flowing from predictors into the
    encoder (stop-gradient mix, reference `fs2.py:154-177`)
  - inference durations -> `length_regulator` with a static frame budget.

Everything returns a flat dict (mel_out/decoder_inp/dur/mel2ph/...), like
the reference's `ret` dict.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from bisinger_tpu.config import HParams
from bisinger_tpu.models.common import (
    ESM,
    Embedding,
    FFTBlocks,
    compute_dtype,
    rel_positional_encoding,
    sinusoidal_positions,
)
from bisinger_tpu.models.predictors import (
    DurationPredictor,
    EnergyPredictor,
    PitchPredictor,
)
from bisinger_tpu.utils.pitch import denorm_f0, f0_to_coarse
from bisinger_tpu.utils.seq import gather_phoneme_states, length_regulator


def grad_scale(x, scale: float):
    """y == x in value; dy/dx == scale (the reference's
    `x.detach() + g * (x - x.detach())`)."""
    sg = jax.lax.stop_gradient(x)
    return sg + scale * (x - sg)


class FastSpeech2(nn.Module):
    """Plain FastSpeech2 (no MIDI). Reference `modules/fastspeech/fs2.py`."""

    hp: HParams
    vocab_size: int
    out_dims: Optional[int] = None
    padding_idx: int = 0

    def _predictor_hidden(self):
        ph = self.hp["predictor_hidden"]
        return ph if ph > 0 else self.hp["hidden_size"]

    # ---- submodule builders (shared with the MIDI subclass) --------------
    def _setup_core(self):
        hp = self.hp
        h = hp["hidden_size"]
        # mixed precision: activations inside the heavy stacks run in
        # `compute_dtype` (default bf16 on TPU); params, module outputs
        # and every loss stay fp32 (SURVEY §7.3)
        dtype = compute_dtype(hp)
        self.compute_dtype = dtype
        self.token_embed = Embedding(self.vocab_size, h, self.padding_idx, name="token_embed")
        self.encoder = FFTBlocks(
            hidden_size=h,
            num_layers=hp["enc_layers"],
            ffn_kernel_size=hp["enc_ffn_kernel_size"],
            num_heads=hp["num_heads"],
            dropout=hp["dropout"],
            use_pos_embed=False,
            padding=hp["ffn_padding"],
            act=hp["ffn_act"],
            remat=hp.get("remat", False),
            dtype=dtype,
            name="encoder",
        )
        self.decoder = FFTBlocks(
            hidden_size=h,
            num_layers=hp["dec_layers"],
            ffn_kernel_size=hp["dec_ffn_kernel_size"],
            num_heads=hp["num_heads"],
            dropout=hp["dropout"],
            use_pos_embed=True,
            padding=hp["ffn_padding"],
            act=hp["ffn_act"],
            remat=hp.get("remat", False),
            dtype=dtype,
            name="decoder",
        )
        out_dims = self.out_dims or hp["audio_num_mel_bins"]
        self.mel_out = nn.Dense(out_dims, name="mel_out")
        self.embed_dropout = nn.Dropout(hp["dropout"])
        # output head width by dur_loss (reference `tts_modules.py:98-105`:
        # mse 1, mog 15 = 5 mixtures x (w, mu, log_sigma), crf 32 states)
        dur_odims = {"mse": 1, "huber": 1, "mog": 15, "crf": 32}[
            hp.get("dur_loss", "mse")
        ]
        self.dur_predictor = DurationPredictor(
            n_layers=hp["dur_predictor_layers"],
            n_chans=self._predictor_hidden(),
            kernel_size=hp["dur_predictor_kernel"],
            dropout=hp["predictor_dropout"],
            padding=hp["ffn_padding"],
            odims=dur_odims,
            dtype=dtype,
            name="dur_predictor",
        )
        if hp["use_spk_id"]:
            self.spk_embed_proj = Embedding(hp["num_spk"] + 1, h, name="spk_embed_proj")
            if hp["use_split_spk_id"]:
                self.spk_embed_f0 = Embedding(hp["num_spk"] + 1, h, name="spk_embed_f0")
                self.spk_embed_dur = Embedding(hp["num_spk"] + 1, h, name="spk_embed_dur")
        elif hp["use_spk_embed"]:
            self.spk_embed_proj = nn.Dense(h, name="spk_embed_proj")
        if hp["use_pitch_embed"]:
            self.pitch_embed = Embedding(300, h, self.padding_idx, name="pitch_embed")
            if hp["pitch_type"] in ("frame", "ph"):
                self.pitch_predictor = PitchPredictor(
                    n_layers=hp["predictor_layers"],
                    n_chans=self._predictor_hidden(),
                    odim=2 if hp["pitch_type"] == "frame" else 1,
                    kernel_size=hp["predictor_kernel"],
                    dropout=hp["predictor_dropout"],
                    padding=hp["ffn_padding"],
                    dtype=dtype,
                    name="pitch_predictor",
                )
            elif hp["pitch_type"] == "cwt":
                # 10-bin CWT spectrogram (+uv) head + (mean, std) stats head
                # (reference `fs2.py:57-73`)
                cwt_out_dims = 10 + (1 if hp["use_uv"] else 0)
                self.cwt_in_proj = nn.Dense(hp["cwt_hidden_size"], name="cwt_in_proj")
                self.cwt_predictor = PitchPredictor(
                    n_layers=hp["predictor_layers"],
                    n_chans=self._predictor_hidden(),
                    odim=cwt_out_dims,
                    kernel_size=hp["predictor_kernel"],
                    dropout=hp["predictor_dropout"],
                    padding=hp["ffn_padding"],
                    dtype=dtype,
                    name="cwt_predictor",
                )
                ch = hp["cwt_hidden_size"]
                self.cwt_stats_0 = nn.Dense(ch, name="cwt_stats_0")
                self.cwt_stats_1 = nn.Dense(ch, name="cwt_stats_1")
                self.cwt_stats_2 = nn.Dense(2, name="cwt_stats_2")
            else:
                raise NotImplementedError(f"pitch_type={hp['pitch_type']}")
        if hp["use_energy_embed"]:
            self.energy_embed = Embedding(256, h, self.padding_idx, name="energy_embed")
            self.energy_predictor = EnergyPredictor(
                n_layers=hp["predictor_layers"],
                n_chans=self._predictor_hidden(),
                odim=1,
                kernel_size=hp["predictor_kernel"],
                dropout=hp["predictor_dropout"],
                padding=hp["ffn_padding"],
                dtype=dtype,
                name="energy_predictor",
            )

    def setup(self):
        self._setup_core()

    # ---- embedding / encoder ---------------------------------------------
    def encode(self, txt_tokens, deterministic=True, **kwargs):
        hp = self.hp
        h = hp["hidden_size"]
        x = math.sqrt(h) * self.token_embed(txt_tokens)
        x = self._add_positions(x, txt_tokens, deterministic)
        padding_mask = txt_tokens == self.padding_idx
        return self.encoder(x, padding_mask, deterministic=deterministic)

    def _add_positions(self, x, txt_tokens, deterministic):
        hp = self.hp
        h = hp["hidden_size"]
        if hp["use_pos_embed"]:
            if hp.get("rel_pos"):
                # ESPnet RelPositionalEncoding: x*sqrt(d) + reversed-pos table
                x = x * math.sqrt(h) + rel_positional_encoding(x.shape[1], h)
            else:
                nonpad = (txt_tokens != self.padding_idx).astype(jnp.int32)
                x = x + sinusoidal_positions(nonpad, h)
        x = self.embed_dropout(x, deterministic=deterministic)
        return x

    # ---- variance adaptors ------------------------------------------------
    def add_dur(self, dur_inp, mel2ph, txt_tokens, ret, max_frames=None):
        hp = self.hp
        src_padding = txt_tokens == self.padding_idx
        dur_inp = grad_scale(dur_inp, hp["predictor_grad"])
        if mel2ph is None:
            dur_log = self.dur_predictor(dur_inp, src_padding)
            ret["dur"] = dur_log
            dur = self.dur_predictor.out2dur(dur_log, padding=src_padding)
            ret["dur_choice"] = dur
            mel2ph = jax.lax.stop_gradient(
                length_regulator(dur, src_padding, max_frames=max_frames)
            )
        else:
            ret["dur"] = self.dur_predictor(dur_inp, src_padding)
        if hp.get("dur_loss") == "crf":
            # the CRF NLL (computed in the task loss) needs the learned
            # transition matrix
            ret["crf_transitions"] = self.dur_predictor.crf_transitions
        ret["mel2ph"] = mel2ph
        return mel2ph

    def add_pitch(self, decoder_inp, f0, uv, mel2ph, ret, encoder_out=None):
        hp = self.hp
        if hp["pitch_type"] == "ph":
            pitch_inp = grad_scale(encoder_out, hp["predictor_grad"])
            ret["pitch_pred"] = pitch_pred = self.pitch_predictor(pitch_inp)
            if f0 is None:
                f0 = pitch_pred[:, :, 0]
            f0_denorm = denorm_f0(f0, None, hp["pitch_norm"], f0_mean=hp.get("f0_mean") or 0.0, f0_std=hp.get("f0_std") or 1.0, use_uv=hp["use_uv"])
            ret["f0_denorm"] = f0_denorm
            pitch = f0_to_coarse(f0_denorm)  # [B, T_txt]
            pitch = jnp.pad(pitch, ((0, 0), (1, 0)))
            pitch = jnp.take_along_axis(pitch, mel2ph, axis=1)  # [B, T_mel]
            return self.pitch_embed(pitch)
        decoder_inp = grad_scale(decoder_inp, hp["predictor_grad"])
        pitch_padding = mel2ph == 0
        if hp["pitch_type"] == "cwt":
            # reference `fs2.py:205-217`
            cwt_out = self.cwt_predictor(self.cwt_in_proj(decoder_inp))
            ret["cwt"] = cwt_out
            stats_h = jax.nn.relu(self.cwt_stats_0(encoder_out[:, 0, :]))
            stats_h = jax.nn.relu(self.cwt_stats_1(stats_h))
            stats_out = self.cwt_stats_2(stats_h)  # [B, 2]
            mean = ret["f0_mean"] = stats_out[:, 0]
            std = ret["f0_std"] = stats_out[:, 1]
            cwt_spec = cwt_out[:, :, :10]
            if f0 is None:
                std = std * hp["cwt_std_scale"]
                f0 = self.cwt2f0_norm(cwt_spec, mean, std, mel2ph)
                if hp["use_uv"]:
                    uv = (cwt_out[:, :, -1] > 0).astype(jnp.float32)
            f0_denorm = denorm_f0(f0, uv, hp["pitch_norm"], f0_mean=hp.get("f0_mean") or 0.0, f0_std=hp.get("f0_std") or 1.0, use_uv=hp["use_uv"])
            ret["f0_denorm"] = f0_denorm
            pitch = f0_to_coarse(f0_denorm)
            return self.pitch_embed(pitch)
        ret["pitch_pred"] = pitch_pred = self.pitch_predictor(decoder_inp)
        if f0 is None:
            f0 = pitch_pred[:, :, 0]
        if hp["use_uv"] and uv is None:
            uv = (pitch_pred[:, :, 1] > 0).astype(jnp.float32)
        f0_denorm = denorm_f0(
            f0, uv, hp["pitch_norm"], f0_mean=hp.get("f0_mean") or 0.0,
            f0_std=hp.get("f0_std") or 1.0, use_uv=hp["use_uv"],
            pitch_padding=pitch_padding,
        )
        ret["f0_denorm"] = f0_denorm
        pitch = f0_to_coarse(f0_denorm)
        return self.pitch_embed(pitch)

    def add_energy(self, decoder_inp, energy, ret):
        decoder_inp = grad_scale(decoder_inp, self.hp["predictor_grad"])
        ret["energy_pred"] = energy_pred = self.energy_predictor(decoder_inp)[:, :, 0]
        if energy is None:
            energy = energy_pred
        energy_ids = jnp.clip(
            jnp.floor(energy * 256 / 4), a_min=0, a_max=255
        ).astype(jnp.int32)
        return self.energy_embed(energy_ids)

    def _spk_embeds(self, spk_embed, spk_embed_dur_id=None, spk_embed_f0_id=None):
        hp = self.hp
        if hp["use_spk_embed"]:
            e = self.spk_embed_proj(spk_embed)[:, None, :]
            return e, e, e
        if hp["use_spk_id"]:
            spk_embed_id = spk_embed
            if spk_embed_dur_id is None:
                spk_embed_dur_id = spk_embed_id
            if spk_embed_f0_id is None:
                spk_embed_f0_id = spk_embed_id
            e = self.spk_embed_proj(spk_embed_id)[:, None, :]
            e_dur = e_f0 = e
            if hp["use_split_spk_id"]:
                e_dur = self.spk_embed_dur(spk_embed_dur_id)[:, None, :]
                e_f0 = self.spk_embed_f0(spk_embed_f0_id)[:, None, :]
            return e, e_dur, e_f0
        return 0.0, 0.0, 0.0

    def run_decoder(self, decoder_inp, tgt_nonpadding, deterministic=True):
        x = self.decoder(decoder_inp, deterministic=deterministic)
        x = self.mel_out(x)
        return x * tgt_nonpadding

    # ---- full forward -----------------------------------------------------
    def __call__(
        self,
        txt_tokens,
        mel2ph=None,
        spk_embed=None,
        ref_mels=None,
        f0=None,
        uv=None,
        energy=None,
        skip_decoder: bool = False,
        spk_embed_dur_id=None,
        spk_embed_f0_id=None,
        infer: bool = False,
        max_frames: Optional[int] = None,
        deterministic: bool = True,
        **kwargs,
    ):
        hp = self.hp
        ret = {}
        encoder_out = self.encode(txt_tokens, deterministic=deterministic, **kwargs)
        src_nonpadding = (txt_tokens > 0).astype(encoder_out.dtype)[:, :, None]
        spk, spk_dur, spk_f0 = self._spk_embeds(spk_embed, spk_embed_dur_id, spk_embed_f0_id)

        dur_inp = (encoder_out + spk_dur) * src_nonpadding
        if mel2ph is None and max_frames is None:
            max_frames = hp["max_frames"]
        mel2ph = self.add_dur(dur_inp, mel2ph, txt_tokens, ret, max_frames=max_frames)

        decoder_inp = gather_phoneme_states(encoder_out, mel2ph)
        # long-form mode: the token->frame gather is where activations
        # switch from token-level (replicated over 'seq') to frame-level
        # (sharded) — constrain here so every downstream frame-level
        # stage inherits the layout (parallel/sequence.py)
        from bisinger_tpu.parallel.sequence import constrain_time

        decoder_inp = constrain_time(decoder_inp, hp)
        decoder_inp_origin = decoder_inp
        tgt_nonpadding = (mel2ph > 0).astype(encoder_out.dtype)[:, :, None]

        pitch_inp = (decoder_inp_origin + spk_f0) * tgt_nonpadding
        if hp["use_pitch_embed"]:
            pitch_inp_ph = (encoder_out + spk_f0) * src_nonpadding
            decoder_inp = decoder_inp + self.add_pitch(
                pitch_inp, f0, uv, mel2ph, ret, encoder_out=pitch_inp_ph
            )
        if hp["use_energy_embed"]:
            decoder_inp = decoder_inp + self.add_energy(pitch_inp, energy, ret)

        decoder_inp = (decoder_inp + spk + self._style_embed(kwargs)) * tgt_nonpadding
        ret["decoder_inp"] = decoder_inp

        if skip_decoder:
            return ret
        ret["mel_out"] = self.run_decoder(
            decoder_inp, tgt_nonpadding, deterministic=deterministic
        )
        return ret

    def _style_embed(self, kwargs):
        return 0.0  # no style embedding in plain FastSpeech2

    def cwt2f0_norm(self, cwt_spec, mean, std, mel2ph):
        """CWT spec -> normalized f0 aligned to mel frames (reference
        `fs2.py:242-247`)."""
        from bisinger_tpu.utils.cwt import cwt2f0_norm

        return cwt2f0_norm(
            cwt_spec, mean, std, mel2ph, self.hp["pitch_norm"], self.hp["use_uv"]
        )


class FastSpeech2MIDI(FastSpeech2):
    """BiSinger's FFT-Singer: adds midi / midi-dur / slur / lang (via ESM)
    embeddings to the encoder input and a speech-vs-singing style embedding
    to the decoder input (reference `modules/diffsinger_midi/fs2.py`).

    With `use_lang_embed: false` the lang/ESM/style additions are dropped,
    yielding the original monolingual DiffSinger-MIDI conditioner the
    `train_m4singer` systems 1/2 train against (their inference never
    feeds lang/speechsing — `train_m4singer/bisinger-inference/a-m4.py:611-619`)."""

    def setup(self):
        self._setup_core()
        h = self.hp["hidden_size"]
        if self.hp.get("use_lang_embed", True):
            self.esm = ESM(
                hidden_size=h,
                num_heads=8,
                cross_batch=self.hp.get("esm_cross_batch", True),
                dtype=self.compute_dtype,
                name="esm",
            )
            self.lang_embed = Embedding(2, h, name="lang_embed")
            self.style_embed = Embedding(3, h, name="style_embed")
        self.midi_embed = Embedding(300, h, self.padding_idx, name="midi_embed")
        self.midi_dur_layer = nn.Dense(h, name="midi_dur_layer")
        self.is_slur_embed = Embedding(2, h, name="is_slur_embed")

    def encode(
        self,
        txt_tokens,
        deterministic=True,
        pitch_midi=None,
        midi_dur=None,
        is_slur=None,
        lang=None,
        **unused,
    ):
        hp = self.hp
        h = hp["hidden_size"]
        x = math.sqrt(h) * self.token_embed(txt_tokens)
        midi_embedding = self.midi_embed(pitch_midi)
        midi_dur_embedding = (
            self.midi_dur_layer(midi_dur[:, :, None]) if midi_dur is not None else 0.0
        )
        slur_embedding = self.is_slur_embed(is_slur) if is_slur is not None else 0.0
        if hp.get("use_lang_embed", True):
            # ESM sees the bare token embedding (reference fs2.py:29-31)
            lang_embedding = self.lang_embed(lang)
            dynamic_lang = self.esm(x, lang_embedding, deterministic=deterministic)
        else:
            dynamic_lang = 0.0
        x = x + midi_embedding + midi_dur_embedding + slur_embedding + dynamic_lang
        x = self._add_positions(x, txt_tokens, deterministic)
        padding_mask = txt_tokens == self.padding_idx
        return self.encoder(x, padding_mask, deterministic=deterministic)

    def _style_embed(self, kwargs):
        speechsing = kwargs.get("speechsing")
        if speechsing is None or not self.hp.get("use_lang_embed", True):
            return 0.0
        return self.style_embed(speechsing)[:, None, :]  # [B, 1, H]
