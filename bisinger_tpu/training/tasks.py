"""Task layer: training recipes as pure train/val step functions.

Counterparts of the reference task classes
(`tasks/tts/fs2.py`, `usr/diffsinger_task.py`), re-shaped for SPMD: a
task owns (model, optimizer, loss assembly) and exposes jit-compiled
`train_step(state, batch, rng)` / `val_step` working on sharded arrays.

  - `AuxDecoderMIDITask`: trains FastSpeech2MIDI standalone — the
    FFT-Singer stage (`usr/diffsinger_task.py:567-577`); losses = mel
    (l1+ssim) + ph/word/sent duration (+ pitch/energy when enabled).
  - `DiffSingerMIDITask`: shallow-diffusion stage
    (`usr/diffsinger_task.py:380-564`): diff_loss + duration losses;
    fs2 warm-start from the stage-1 checkpoint; `switch_midi2f0_step`
    curriculum (past N steps, f0/uv inputs are dropped so MIDI drives
    pitch).
  - `PitchExtractionTask`: PE on (mel -> f0/uv) with f0 L1 + uv BCE
    (`tasks/tts/pe.py:103-157`).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from bisinger_tpu.config import HParams
from bisinger_tpu.models.diffusion import GaussianDiffusion
from bisinger_tpu.models.fs2 import FastSpeech2, FastSpeech2MIDI
from bisinger_tpu.models.pe import PitchExtractor
from bisinger_tpu.training import losses as L
from bisinger_tpu.training.optim import build_optimizer, predictor_only_mask


class TrainState(train_state.TrainState):
    pass


def _model_kwargs(batch: Dict[str, Any], hp: HParams) -> Dict[str, Any]:
    """Map a collated batch to FastSpeech2MIDI call kwargs."""
    kwargs = dict(
        txt_tokens=batch["txt_tokens"],
        mel2ph=batch["mel2ph"],
        spk_embed=batch["spk_ids"] if hp["use_spk_id"] else batch.get("spk_embed"),
        ref_mels=batch["mels"],
        f0=batch.get("f0"),
        uv=batch.get("uv"),
        energy=batch.get("energy"),
    )
    if hp.get("use_midi"):
        kwargs.update(
            pitch_midi=batch.get("pitch_midi"),
            midi_dur=batch.get("midi_dur"),
            is_slur=batch.get("is_slur"),
            lang=batch.get("lang"),
            speechsing=batch.get("speechsing"),
        )
    if hp["pitch_type"] == "cwt" and "cwt_spec" in batch:
        # gt f0 input comes from the recorded CWT spec (reference
        # `tasks/tts/fs2.py:147-151`)
        from bisinger_tpu.utils.cwt import cwt2f0_norm

        kwargs["f0"] = cwt2f0_norm(
            batch["cwt_spec"], batch["f0_mean"], batch["f0_std"], batch["mel2ph"],
            hp["pitch_norm"], hp["use_uv"],
        )
    return kwargs


class AuxDecoderMIDITask:
    """FFT-Singer stage: FastSpeech2MIDI alone."""

    schedule = "rsqrt"

    def __init__(self, hp: HParams, vocab_size: int):
        if hp.get("dur_loss") == "crf" and hp.get("use_midi", True):
            # the CRF head's states ARE frame counts capped at 31 (the
            # reference torchcrf ceiling, `tts_modules.py:102-105`);
            # singing phone durations routinely exceed it, silently
            # clipping targets — fail loudly instead
            raise ValueError(
                "dur_loss: crf caps durations at 31 frames (torchcrf "
                "parity) and is speech-only; singing/MIDI configs must "
                "use dur_loss: mse or mog"
            )
        self.hp = hp
        self.vocab_size = vocab_size
        self.model = self.build_model()
        self.tx = build_optimizer(hp, schedule=self.schedule, trainable_mask=None)

    def configure_accumulation(self, steps_per_epoch: int):
        """Rebuild the optimizer once batches/epoch is known — needed for
        the reference's per-epoch GradientAccumulationScheduler dict form
        (`pl_utils.py:256-280`). Called by the trainer before init_state."""
        self._steps_per_epoch = steps_per_epoch
        from collections.abc import Mapping

        if isinstance(self.hp.get("accumulate_grad_batches", 1), Mapping):
            self.tx = build_optimizer(
                self.hp, schedule=self.schedule, trainable_mask=None,
                steps_per_epoch=steps_per_epoch,
            )

    # ---- model -----------------------------------------------------------
    def build_model(self):
        # plain speech configs (use_midi off) train the reference's
        # FastSpeech2Task model (`tasks/tts/fs2.py:71-76`)
        if self.hp.get("use_midi"):
            return FastSpeech2MIDI(hp=self.hp, vocab_size=self.vocab_size)
        return FastSpeech2(hp=self.hp, vocab_size=self.vocab_size)

    def init_state(self, rng, batch: Dict[str, Any]) -> TrainState:
        variables = self.model.init(
            {"params": rng}, **_model_kwargs(batch, self.hp)
        )
        return TrainState.create(
            apply_fn=self.model.apply, params=variables["params"], tx=self.tx
        )

    # ---- losses ----------------------------------------------------------
    def compute_losses(
        self, ret: Dict[str, Any], batch: Dict[str, Any]
    ) -> Dict[str, jnp.ndarray]:
        hp = self.hp
        losses: Dict[str, jnp.ndarray] = {}
        L.add_mel_loss(ret["mel_out"], batch["mels"], losses, hp)
        wdb = batch.get("word_boundary")
        if wdb is None and "ph_is_sil" in batch and ret["dur"].ndim == 2:
            # speech corpora carry no word_boundary: split words at
            # silence phones like the reference FastSpeech2Task
            # (`tasks/tts/fs2.py:213-259`; flags binarized as ph_is_sil)
            L.add_dur_loss_sil(
                ret["dur"], batch["mel2ph"], batch["txt_tokens"],
                batch["ph_is_sil"].astype(jnp.float32), losses, hp,
            )
        else:
            L.add_dur_loss_midi(
                ret["dur"], batch["mel2ph"], batch["txt_tokens"], wdb,
                losses, hp, crf_transitions=ret.get("crf_transitions"),
            )
        if hp["use_pitch_embed"]:
            L.add_pitch_loss(ret, batch, losses, hp)
        if hp["use_energy_embed"]:
            L.add_energy_loss(ret["energy_pred"], batch["energy"], losses, hp)
        return losses

    def _forward(self, params, batch, rng, deterministic: bool, drop_f0: bool = False):
        rngs = {"dropout": rng}
        kwargs = _model_kwargs(batch, self.hp)
        if drop_f0:
            kwargs["f0"] = None
            kwargs["uv"] = None
        return self.model.apply(
            {"params": params},
            **kwargs,
            deterministic=deterministic,
            rngs=rngs,
        )

    # ---- steps -----------------------------------------------------------
    @functools.partial(
        jax.jit, static_argnums=0, static_argnames=("drop_f0",), donate_argnums=1
    )
    def train_step(
        self, state: TrainState, batch: Dict[str, Any], rng, drop_f0: bool = False
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def loss_fn(params):
            ret = self._forward(params, batch, rng, deterministic=False, drop_f0=drop_f0)
            losses = self.compute_losses(ret, batch)
            return sum(losses.values()), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        losses["total_loss"] = total
        losses["grad_norm"] = optax_global_norm(grads)
        return state, losses

    @functools.partial(jax.jit, static_argnums=0, static_argnames=("drop_f0",))
    def val_step(self, state: TrainState, batch: Dict[str, Any], rng, drop_f0: bool = False):
        ret = self._forward(state.params, batch, rng, deterministic=True, drop_f0=drop_f0)
        losses = self.compute_losses(ret, batch)
        losses["total_loss"] = sum(losses.values())
        return losses

    # ---- inference -------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def infer_step(self, params, batch: Dict[str, Any], rng):
        kwargs = _model_kwargs(batch, self.hp)
        kwargs["mel2ph"] = None
        kwargs["f0"] = None
        kwargs["uv"] = None
        kwargs["ref_mels"] = None
        return self.model.apply(
            {"params": params}, **kwargs, infer=True,
            max_frames=batch["mels"].shape[1], rngs={"diffusion": rng},
        )


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))


class DiffSingerMIDITask(AuxDecoderMIDITask):
    """Shallow-diffusion stage over the MIDI fs2 conditioner."""

    schedule = "step"

    def __init__(self, hp: HParams, vocab_size: int, freeze_fs2: bool = False):
        self.freeze_fs2 = freeze_fs2
        super().__init__(hp, vocab_size)

    def build_model(self):
        return GaussianDiffusion(
            hp=self.hp, vocab_size=self.vocab_size,
            out_dims=self.hp["audio_num_mel_bins"],
        )

    def init_state(self, rng, batch: Dict[str, Any]) -> TrainState:
        variables = self.model.init(
            {"params": rng},
            **_model_kwargs(batch, self.hp),
            method=GaussianDiffusion.init_path,
        )
        params = variables["params"]
        if self.freeze_fs2:
            # DiffSpeech policy: only '*predictor*' fs2 params train
            # (`usr/diffspeech_task.py:37-39`)
            mask = predictor_only_mask(params)
            self.tx = build_optimizer(
                self.hp, schedule=self.schedule, trainable_mask=mask,
                steps_per_epoch=getattr(self, "_steps_per_epoch", None),
            )
        return TrainState.create(apply_fn=self.model.apply, params=params, tx=self.tx)

    def step_flags(self, step: Optional[int]) -> Dict[str, Any]:
        """switch_midi2f0_step: past N updates, stop FEEDING gt f0/uv to
        the model (`usr/diffsinger_task.py:391-399`) — they stay in the
        batch as pitch-loss targets. Returned as a STATIC jit kwarg, so
        there are exactly two compiled variants."""
        sw = self.hp.get("switch_midi2f0_step")
        return {"drop_f0": bool(sw is not None and step is not None and step > sw)}

    def _forward(self, params, batch, rng, deterministic: bool, drop_f0: bool = False):
        rng_drop, rng_diff = jax.random.split(rng)
        kwargs = _model_kwargs(batch, self.hp)
        if drop_f0:
            kwargs["f0"] = None
            kwargs["uv"] = None
        return self.model.apply(
            {"params": params},
            **kwargs,
            deterministic=deterministic,
            rng=rng_diff,
            rngs={"dropout": rng_drop, "diffusion": rng_diff},
        )

    def compute_losses(self, ret, batch):
        hp = self.hp
        losses: Dict[str, jnp.ndarray] = {}
        losses["mel"] = ret["diff_loss"]
        wdb = batch.get("word_boundary")
        if wdb is None and "ph_is_sil" in batch and ret["dur"].ndim == 2:
            # speech corpora carry no word_boundary: split words at
            # silence phones like the reference FastSpeech2Task
            # (`tasks/tts/fs2.py:213-259`; flags binarized as ph_is_sil)
            L.add_dur_loss_sil(
                ret["dur"], batch["mel2ph"], batch["txt_tokens"],
                batch["ph_is_sil"].astype(jnp.float32), losses, hp,
            )
        else:
            L.add_dur_loss_midi(
                ret["dur"], batch["mel2ph"], batch["txt_tokens"], wdb,
                losses, hp, crf_transitions=ret.get("crf_transitions"),
            )
        if hp["use_pitch_embed"]:
            L.add_pitch_loss(ret, batch, losses, hp)
        if hp["use_energy_embed"]:
            L.add_energy_loss(ret["energy_pred"], batch["energy"], losses, hp)
        return losses

    def warm_start_fs2(self, state: TrainState, fs2_params) -> TrainState:
        """Load the FFT-Singer checkpoint into model.fs2 (reference
        `usr/diffsinger_task.py:64-65`)."""
        from bisinger_tpu.training.checkpoints import load_params_into

        params = dict(state.params)
        params["fs2"] = load_params_into(state.params["fs2"], fs2_params)
        return state.replace(params=params)

    @functools.partial(jax.jit, static_argnums=0)
    def infer_step(self, params, batch: Dict[str, Any], rng):
        kwargs = _model_kwargs(batch, self.hp)
        kwargs["mel2ph"] = None  # durations come from the predictor
        kwargs["f0"] = None
        kwargs["uv"] = None
        kwargs["ref_mels"] = None
        return self.model.apply(
            {"params": params}, **kwargs, infer=True, rng=rng,
            max_frames=batch["mels"].shape[1], rngs={"diffusion": rng},
        )


class PETrainState(train_state.TrainState):
    """TrainState + BatchNorm running stats (the PE Prenet uses real
    BatchNorm for parity with the reference `pe.py:18`)."""

    batch_stats: Any = None


class PitchExtractionTask:
    """PE training: mel -> (f0, uv) (`tasks/tts/pe.py:103-157`)."""

    def __init__(self, hp: HParams):
        self.hp = hp
        self.model = PitchExtractor(hp=hp)
        self.tx = build_optimizer(hp, schedule="rsqrt")

    def configure_accumulation(self, steps_per_epoch: int):
        """Same per-epoch grad-accum rebuild as AuxDecoderMIDITask —
        without it, a dict-form accumulate_grad_batches would silently
        train PE with no accumulation."""
        from collections.abc import Mapping

        if isinstance(self.hp.get("accumulate_grad_batches", 1), Mapping):
            self.tx = build_optimizer(
                self.hp, schedule="rsqrt", steps_per_epoch=steps_per_epoch
            )

    def init_state(self, rng, batch) -> PETrainState:
        variables = self.model.init({"params": rng}, batch["mels"])
        return PETrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=self.tx,
        )

    def compute_losses(self, ret, batch):
        hp = self.hp
        losses: Dict[str, jnp.ndarray] = {}
        nonpadding = (batch["mel2ph"] != 0).astype(jnp.float32)
        L.add_f0_loss(
            ret["pitch_pred"], batch["f0"], batch["uv"], nonpadding, losses, hp
        )
        return losses

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: PETrainState, batch, rng):
        def loss_fn(params):
            ret, mutated = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["mels"],
                deterministic=False,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            losses = self.compute_losses(ret, batch)
            return sum(losses.values()), (losses, mutated["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        losses["total_loss"] = total
        return state, losses

    @functools.partial(jax.jit, static_argnums=0)
    def val_step(self, state: PETrainState, batch, rng):
        ret = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["mels"],
        )
        losses = self.compute_losses(ret, batch)
        losses["total_loss"] = sum(losses.values())
        return losses

    @functools.partial(jax.jit, static_argnums=0)
    def infer_step(self, variables, mels):
        """`variables` = {'params': ..., 'batch_stats': ...} (eval mode
        uses the running BatchNorm stats, like torch `.eval()`)."""
        return self.model.apply(variables, mels)


class DiffSpeechTask(DiffSingerMIDITask):
    """Shallow-diffusion TTS (reference `usr/diffspeech_task.py:18-122`):
    same training loop with the fs2 frozen except '*predictor*' params."""

    def __init__(self, hp: HParams, vocab_size: int):
        super().__init__(hp, vocab_size, freeze_fs2=True)


class DiffSingerTask(DiffSingerMIDITask):
    """Non-MIDI DiffSinger (reference `usr/diffsinger_task.py:32-137`):
    identical loop; configs simply unset use_midi so the plain
    FastSpeech2 conditioner is built."""


class DiffFsTask(DiffSingerMIDITask):
    """Plain (non-shallow) diffusion task (reference `usr/task.py:15-84`,
    StepLR schedule): run with gaussian_start=true, K_step=timesteps."""


class DiffSingerOfflineTask(DiffSingerMIDITask):
    """Offline variant: fs2 mels precomputed on disk
    (`hp['fs2_mel_dir']/<item>.npy`), diffusion starts from the recorded
    fs2 mel (reference `usr/diffsinger_task.py` DiffSingerOfflineTask +
    ShallowDiffusionOfflineDataset + OfflineGaussianDiffusion:
    ref_mels = (gt_mel, fs2_mel))."""

    def build_model(self):
        from bisinger_tpu.models.diffusion import OfflineGaussianDiffusion

        return OfflineGaussianDiffusion(
            hp=self.hp, vocab_size=self.vocab_size,
            out_dims=self.hp["audio_num_mel_bins"],
        )

    def _forward(self, params, batch, rng, deterministic: bool, drop_f0: bool = False):
        rng_drop, rng_diff = jax.random.split(rng)
        kwargs = _model_kwargs(batch, self.hp)
        kwargs["ref_mels"] = (batch["mels"], batch["fs2_mels"])
        if drop_f0:
            kwargs["f0"] = None
            kwargs["uv"] = None
        return self.model.apply(
            {"params": params}, **kwargs, deterministic=deterministic,
            rng=rng_diff, rngs={"dropout": rng_drop, "diffusion": rng_diff},
        )

    def init_state(self, rng, batch):
        variables = self.model.init(
            {"params": rng, "diffusion": rng},
            **{**_model_kwargs(batch, self.hp),
               "ref_mels": (batch["mels"], batch["fs2_mels"])},
        )
        params = variables["params"]
        if self.freeze_fs2:
            mask = predictor_only_mask(params)
            self.tx = build_optimizer(
                self.hp, schedule=self.schedule, trainable_mask=mask,
                steps_per_epoch=getattr(self, "_steps_per_epoch", None),
            )
        return TrainState.create(apply_fn=self.model.apply, params=params, tx=self.tx)

    @functools.partial(jax.jit, static_argnums=0)
    def infer_step(self, params, batch, rng):
        kwargs = _model_kwargs(batch, self.hp)
        kwargs["f0"] = None
        kwargs["uv"] = None
        kwargs["ref_mels"] = (batch["mels"], batch["fs2_mels"])
        return self.model.apply(
            {"params": params}, **kwargs, infer=True, rng=rng,
            rngs={"diffusion": rng},
        )


# reference alias: AuxDecoderMIDITask subsumes the plain fs2 recipe
FastSpeech2Task = AuxDecoderMIDITask
