"""End-to-end SVS inference: score JSON -> phones/midi -> mel (diffusion)
-> f0 (PE) -> waveform (HiFi-GAN NSF).

Counterpart of the reference inference apps
(`inference/m4singer/base_svs_infer.py` + `ds_e2e.py` + the bilingual
scripts in `inference/m4singer/bisinger/`), reorganized TPU-first:

  - all padding snaps to the configured static buckets so repeated calls
    reuse compiled programs;
  - the whole mel->f0->wav chain runs on device; host code only does text
    processing and wav IO;
  - `infer_from_json` batches utterances for throughput.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bisinger_tpu.config import HParams
from bisinger_tpu.data.dataset import pick_bucket
from bisinger_tpu.data.text.frontend import BilingualFrontend
from bisinger_tpu.models.diffusion import GaussianDiffusion
from bisinger_tpu.training.trainer import device_batch
from bisinger_tpu.utils.audio import save_wav
from bisinger_tpu.utils.text_encoder import build_phone_encoder
from bisinger_tpu.vocoders.hifigan import HifiGAN


class SVSInfer:
    """Singing-voice synthesis pipeline around trained checkpoints."""

    def __init__(
        self,
        hp: HParams,
        diffusion_params=None,
        pe_params=None,
        vocoder: Optional[HifiGAN] = None,
        lexicon_path: Optional[str] = None,
    ):
        self.hp = hp
        self.encoder = build_phone_encoder(hp["binary_data_dir"])
        spk_map_fn = os.path.join(hp["binary_data_dir"], "spk_map.json")
        self.spk_map = json.load(open(spk_map_fn)) if os.path.exists(spk_map_fn) else {}
        # `en_phone_subst: system1|system2` selects the monolingual
        # (train_m4singer) EN->CN phone substitution tables
        self.frontend = BilingualFrontend(
            self.encoder, lexicon_path, phone_subst=hp.get("en_phone_subst")
        )
        # honor the trained task class (hp['task_cls'] is persisted in the
        # work-dir config): restoring e.g. an AuxDecoderMIDITask or
        # offline-diffusion checkpoint into a hardcoded DiffSingerMIDITask
        # template would fail with a param-tree mismatch
        from bisinger_tpu.run import resolve_task_cls

        task_cls = resolve_task_cls(hp.get("task_cls", ""))
        self.task = task_cls(hp, self.encoder.vocab_size)
        self.params = diffusion_params
        # PE runs in eval mode and needs both params and the BatchNorm
        # running stats; accept either {'params':..., 'batch_stats':...}
        # or bare params (stats default to init values: mean 0 / var 1).
        # Copy into a fresh dict: the caller's mapping must not be
        # mutated (and may be an immutable FrozenDict).
        if pe_params is not None and "params" not in pe_params:
            pe_params = {"params": pe_params, "batch_stats": {}}
        elif pe_params is not None:
            pe_params = dict(pe_params)
        self.pe_params = pe_params
        if pe_params is not None:
            from bisinger_tpu.training.tasks import PitchExtractionTask

            self.pe_task = PitchExtractionTask(hp)
            if not pe_params.get("batch_stats"):
                tmpl = self.pe_task.model.init(
                    jax.random.PRNGKey(0), np.zeros((1, 8, 80), np.float32)
                )
                pe_params["batch_stats"] = tmpl.get("batch_stats", {})
        else:
            self.pe_task = None
        self.vocoder = vocoder
        self._fused = self._make_fused_synth()

    @classmethod
    def from_work_dir(cls, hp: HParams, work_dir: str, **kwargs) -> "SVSInfer":
        """Load the latest diffusion checkpoint from a training work dir."""
        from bisinger_tpu.training.checkpoints import CheckpointManager

        inst = cls(hp, **kwargs)
        # init a template state to restore into
        dummy = inst._dummy_batch()
        state = inst.task.init_state(jax.random.PRNGKey(0), dummy)
        mgr = CheckpointManager(os.path.join(work_dir, "ckpt"))
        restored = mgr.restore(jax.device_get(state))
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {work_dir}")
        inst.params = restored.params
        # PE for f0 re-estimation (reference builds it from pe_ckpt when
        # pe_enable, `usr/diffsinger_task.py:36-40`)
        pe_dir = hp.get("pe_ckpt", "")
        if hp.get("pe_enable"):
            pe_restored = None
            if pe_dir and os.path.isdir(os.path.join(pe_dir, "ckpt")):
                from bisinger_tpu.training.tasks import PitchExtractionTask

                pe_task = PitchExtractionTask(hp)
                pe_state = pe_task.init_state(
                    jax.random.PRNGKey(0),
                    {"mels": dummy["mels"], "f0": dummy["f0"], "uv": dummy["uv"]},
                )
                pe_mgr = CheckpointManager(os.path.join(pe_dir, "ckpt"))
                pe_restored = pe_mgr.restore(jax.device_get(pe_state))
                if pe_restored is not None:
                    inst.pe_params = {
                        "params": pe_restored.params,
                        "batch_stats": pe_restored.batch_stats or {},
                    }
                    inst.pe_task = pe_task
                    # the fused program closes over the PE task: rebuild
                    inst._fused = inst._make_fused_synth()
            if pe_restored is None:
                print(
                    f"| WARNING: pe_enable set but no PE checkpoint under "
                    f"{pe_dir!r}; falling back to the model's own f0",
                    flush=True,
                )
        return inst

    def _dummy_batch(self) -> Dict[str, Any]:
        hp = self.hp
        t_txt = hp["bucket_tokens"][0]
        t_mel = hp["bucket_frames"][0]
        z1 = np.zeros((1, t_txt), np.int64)
        out = {
            "txt_tokens": z1,
            "mel2ph": np.zeros((1, t_mel), np.int64),
            "spk_ids": np.zeros((1,), np.int64),
            "mels": np.zeros((1, t_mel, hp["audio_num_mel_bins"]), np.float32),
            "f0": np.zeros((1, t_mel), np.float32),
            "uv": np.zeros((1, t_mel), np.float32),
            "pitch_midi": z1.copy(),
            "midi_dur": np.zeros((1, t_txt), np.float32),
            "is_slur": z1.copy(),
            "word_boundary": z1.copy(),
            "lang": z1.copy(),
            "speechsing": np.ones((1,), np.int64),
        }
        if self.hp.get("use_spk_embed"):
            out["spk_embed"] = np.zeros((1, 256), np.float32)
        return out

    # ---- batching ---------------------------------------------------------
    def items_to_batch(self, items: List[Dict[str, Any]]) -> Dict[str, Any]:
        hp = self.hp
        max_tok = max(len(it["ph_token"]) for it in items)
        t_txt = pick_bucket(max_tok, hp["bucket_tokens"])
        # mel frame budget from the score's REAL duration (total_sec: each
        # note counted once); the per-phone midi_dur sum repeats every
        # note's dur per phone, overbooking the bucket 2-3x
        frames = [
            int(
                float(it.get("total_sec") or np.sum(it["midi_dur"]))
                * hp["audio_sample_rate"] / hp["hop_size"]
            )
            + 8
            for it in items
        ]
        t_mel = pick_bucket(max(frames), hp["bucket_frames"])
        if max_tok > t_txt or max(frames) > t_mel:
            print(
                f"| WARNING: score exceeds the largest static bucket "
                f"(tokens {max_tok}>{t_txt} or frames {max(frames)}>"
                f"{t_mel}) and will be TRUNCATED — split the score (the "
                "HTTP server's chunked synthesis does this) or raise "
                "bucket_tokens/bucket_frames",
                flush=True,
            )
        # the BATCH axis is a static shape too: under the serving
        # micro-batcher group sizes vary request-to-request, and every
        # distinct size would otherwise compile a fresh device program
        # (60s+ through the TPU tunnel). Pad the batch up to a bucket
        # size; callers already trim outputs by len(items).
        b = len(items)
        b_buckets = self.hp.get("bucket_batch_sizes") or []
        if b_buckets and b <= max(b_buckets):
            b = pick_bucket(b, b_buckets)

        def pad1(key, dtype):
            out = np.zeros((b, t_txt), dtype)
            for i, it in enumerate(items):
                x = it[key][:t_txt]
                out[i, : len(x)] = x
            return out

        batch = {
            "txt_tokens": pad1("ph_token", np.int64),
            "pitch_midi": pad1("pitch_midi", np.int64),
            "midi_dur": pad1("midi_dur", np.float32),
            "is_slur": pad1("is_slur", np.int64),
            "lang": pad1("lang", np.int64),
            "spk_ids": np.asarray(
                [it["spk_id"] for it in items] + [0] * (b - len(items)),
                np.int64,
            ),
            "speechsing": np.asarray(
                [it["speechsing"] for it in items] + [1] * (b - len(items)),
                np.int64,
            ),
            "mels": np.zeros((b, t_mel, hp["audio_num_mel_bins"]), np.float32),
            "mel2ph": np.zeros((b, t_mel), np.int64),
            "f0": np.zeros((b, t_mel), np.float32),
            "uv": np.zeros((b, t_mel), np.float32),
            "word_boundary": np.zeros((b, t_txt), np.int64),
        }
        if self.hp.get("use_spk_embed"):
            # reference-speaker vector per item (score key 'spk_embed',
            # else zeros — a neutral voice for embedding-conditioned
            # models, which would otherwise crash on spk_embed=None)
            batch["spk_embed"] = np.stack(
                [
                    np.asarray(it.get("spk_embed", np.zeros(256)), np.float32)
                    for it in items
                ]
                + [np.zeros(256, np.float32)] * (b - len(items))
            )
        return batch

    # ---- forward ----------------------------------------------------------
    def _make_fused_synth(self):
        """ONE device program for score -> mel -> f0 -> wav (the shape of
        bench.py's `synth`). The staged path (forward_model + PE +
        spec2wav_batch) runs three programs with the mel and f0 bouncing
        through host numpy between them — over a tunneled TPU that
        host<->device round trip dominates serving latency. Returns None
        when fusion can't apply (no jax vocoder, or host-side denoise
        post-processing is configured)."""
        voc = self.vocoder
        if voc is None or not hasattr(voc, "_forward"):
            return None
        if self.hp.get("use_denoise"):
            return None  # denoise is host-side numpy (vocoder_utils)
        task, hp = self.task, self.hp
        pe_task, pe_vars = self.pe_task, self.pe_params
        use_nsf = bool(hp.get("use_nsf"))

        def fused(params, voc_params, pe_vars_in, batch, rng):
            ret = task.infer_step(params, batch, rng)  # nested jit inlines
            mel, mel2ph = ret["mel_out"], ret["mel2ph"]
            if pe_task is not None and pe_vars is not None:
                f0 = pe_task.infer_step(pe_vars_in, mel)["f0_denorm_pred"]
            elif "f0_denorm" in ret:
                f0 = ret["f0_denorm"]
            else:
                # match the staged fallback (zeros -> NSF runs unvoiced)
                f0 = jnp.zeros(mel.shape[:2], jnp.float32)
            if use_nsf:
                wav = voc._forward(
                    voc_params, mel, f0, jax.random.fold_in(rng, 1)
                )
            else:
                wav = voc._forward_no_f0(voc_params, mel)
            return wav, mel, mel2ph

        return jax.jit(fused)

    def forward_model(self, batch: Dict[str, Any], rng=None) -> Dict[str, Any]:
        assert self.params is not None, "no diffusion params loaded"
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        ret = self.task.infer_step(self.params, device_batch(batch), rng)
        mel_out = np.asarray(ret["mel_out"])  # [B, T, 80]
        mel2ph = np.asarray(ret["mel2ph"])
        # Safety net behind the bucket-budget estimate in items_to_batch:
        # if the PREDICTED durations fill the whole mel bucket, the score
        # almost certainly wanted more frames than the bucket holds.
        t_mel = mel2ph.shape[1]
        sat = [int((mel2ph[b] > 0).sum()) for b in range(mel2ph.shape[0])]
        if any(s >= t_mel for s in sat):
            print(
                f"| WARNING: predicted durations fill the entire mel bucket "
                f"(t_mel={t_mel}) for {sum(s >= t_mel for s in sat)} item(s) "
                "— output is likely truncated; split the score or raise "
                "bucket_frames",
                flush=True,
            )
        out = {"mel_out": mel_out, "mel2ph": mel2ph}
        if self.pe_task is not None and self.pe_params is not None:
            pe_ret = self.pe_task.infer_step(self.pe_params, ret["mel_out"])
            out["f0_pred"] = np.asarray(pe_ret["f0_denorm_pred"])
        elif "f0_denorm" in ret:
            out["f0_pred"] = np.asarray(ret["f0_denorm"])
        return out

    def infer_once(self, inp: Dict[str, Any], rng=None) -> np.ndarray:
        if self._fused is not None:
            return self.infer_batch([inp], rng)[0]
        item = self.frontend(inp, self.spk_map)
        batch = self.items_to_batch([item])
        out = self.forward_model(batch, rng)
        mel = out["mel_out"][0]
        n_frames = max(int((out["mel2ph"][0] > 0).sum()), 1)
        mel = mel[:n_frames]
        f0 = out.get("f0_pred")
        f0 = f0[0][:n_frames] if f0 is not None else None
        if self.vocoder is not None:
            return self.vocoder.spec2wav(mel, f0)
        # no vocoder: return mel (callers may use Griffin-Lim externally)
        return mel

    def infer_batch(
        self, inputs: List[Dict[str, Any]], rng=None
    ) -> List[np.ndarray]:
        """Synthesize several scores in ONE device program (the batch axis
        amortizes the diffusion scan — the measured per-chip throughput
        lever, see BASELINE.md)."""
        items = [self.frontend(inp, self.spk_map) for inp in inputs]
        batch = self.items_to_batch(items)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if self._fused is not None:
            assert self.params is not None, "no diffusion params loaded"
            wav_d, _, mel2ph_d = self._fused(
                self.params, self.vocoder.params, self.pe_params,
                device_batch(batch), rng,
            )
            # one host fetch for the whole batch
            wavs = np.asarray(wav_d, np.float32)
            mel2ph = np.asarray(mel2ph_d)
            hop = self.hp["hop_size"]
            return [
                wavs[b][: max(int((mel2ph[b] > 0).sum()), 1) * hop]
                for b in range(len(items))
            ]
        out = self.forward_model(batch, rng)
        n_frames = [
            max(int((out["mel2ph"][b] > 0).sum()), 1) for b in range(len(items))
        ]
        if self.vocoder is not None:
            # vocode the bucket-padded batch in ONE program (per-item
            # exact-length calls would recompile per unique length), then
            # trim each wav to its frame count
            f0s = out.get("f0_pred")
            if f0s is None:
                f0s = np.zeros(out["mel_out"].shape[:2], np.float32)
            wavs = self.vocoder.spec2wav_batch(
                out["mel_out"], f0s, rng=jax.random.fold_in(rng, 1)
            )
            hop = self.hp["hop_size"]
            return [wavs[b][: n_frames[b] * hop] for b in range(len(items))]
        return [out["mel_out"][b][: n_frames[b]] for b in range(len(items))]

    def infer_from_json(
        self,
        json_fn: str,
        save_dir: str,
        bpm: Optional[float] = None,
        batch_size: int = 8,
    ) -> List[str]:
        """Batch inference over a JSON list of score dicts (reference
        `infer_from_json:559-582`), `batch_size` utterances per device
        program."""
        import time
        from concurrent.futures import ThreadPoolExecutor

        with open(json_fn) as f:
            inputs = json.load(f)
        if bpm is not None:
            inputs = [dict(inp, bpm=bpm) for inp in inputs]
        os.makedirs(save_dir, exist_ok=True)
        paths = []
        futures = []
        profile = bool(self.hp.get("profile_infer"))
        audio_seconds = 0.0
        t0 = time.perf_counter()
        # async result saving (reference test_start Pool(8) + save_result,
        # `tasks/tts/tts.py:106-118`, `fs2.py:560-576`) — device stays busy
        # while the host writes wav/npy files
        with ThreadPoolExecutor(max_workers=4) as pool:
            for start in range(0, len(inputs), batch_size):
                group = inputs[start : start + batch_size]
                wavs = self.infer_batch(group)
                for i, (inp, wav) in enumerate(zip(group, wavs)):
                    name = inp.get("item_name", f"item_{start + i}")
                    path = os.path.join(save_dir, f"{name}.wav")
                    if wav.ndim == 1:
                        futures.append(
                            pool.submit(
                                save_wav, wav, path, self.hp["audio_sample_rate"]
                            )
                        )
                        audio_seconds += len(wav) / self.hp["audio_sample_rate"]
                    else:
                        path = path.replace(".wav", "_mel.npy")
                        futures.append(pool.submit(np.save, path, wav))
                        audio_seconds += (
                            wav.shape[0]
                            * self.hp["hop_size"]
                            / self.hp["audio_sample_rate"]
                        )
                    paths.append(path)
            for f in futures:
                f.result()
        if profile:
            # the reference's north-star counter (`fs2.py:624-630`)
            dt = time.perf_counter() - t0
            print(
                f"| profile_infer: {audio_seconds:.2f} audio-s in {dt:.2f} s "
                f"({audio_seconds / max(dt, 1e-9):.2f} audio-s/s)",
                flush=True,
            )
        return paths
