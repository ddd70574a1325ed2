"""CLI entry point (reference `tasks/run.py` + `data_gen/tts/bin/binarize.py`).

Usage:
    python -m bisinger_tpu.run --config exp.yaml --exp_name my_exp            # train
    python -m bisinger_tpu.run --config exp.yaml --binarize                   # binarize
    python -m bisinger_tpu.run --config exp.yaml --exp_name my_exp --infer \
        --input scores.json --out out/                                        # infer

The task class comes from hparams `task_cls` (dotted path), defaulting to
the BiSinger diffusion recipe.
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys

# pin BLAS/OpenMP to one thread BEFORE numpy's first import (reference
# `base_binarizer.py:3`): forked binarizer workers inherit the parent's
# already-initialized pools, so setting this later has no effect —
# without it, N workers x default threads oversubscribes the host
os.environ.setdefault("OMP_NUM_THREADS", "1")


def _honor_jax_platforms_env():
    """Make `JAX_PLATFORMS=cpu python -m bisinger_tpu.run ...` actually
    run on CPU: a sitecustomize that registers an out-of-tree backend
    (e.g. the axon TPU plugin) may force its platform via jax.config at
    interpreter start, AFTER the env var was read — silently sending a
    'CPU' run through the TPU tunnel. The user's env var wins here."""
    env = os.environ.get("JAX_PLATFORMS")
    if env:
        import jax

        if str(jax.config.jax_platforms or "") != env:
            jax.config.update("jax_platforms", env)


TASK_ALIASES = {
    # reference task_cls names -> this framework's tasks
    "usr.diffsinger_task.DiffSingerMIDITask": "bisinger_tpu.training.tasks.DiffSingerMIDITask",
    "usr.diffsinger_task.AuxDecoderMIDITask": "bisinger_tpu.training.tasks.AuxDecoderMIDITask",
    "tasks.tts.pe.PitchExtractionTask": "bisinger_tpu.training.tasks.PitchExtractionTask",
    "tasks.tts.fs2.FastSpeech2Task": "bisinger_tpu.training.tasks.FastSpeech2Task",
    "usr.diffspeech_task.DiffSpeechTask": "bisinger_tpu.training.tasks.DiffSpeechTask",
    "usr.diffsinger_task.DiffSingerTask": "bisinger_tpu.training.tasks.DiffSingerTask",
    "usr.diffsinger_task.DiffSingerOfflineTask": "bisinger_tpu.training.tasks.DiffSingerOfflineTask",
    "usr.task.DiffFsTask": "bisinger_tpu.training.tasks.DiffFsTask",
}


BINARIZER_ALIASES = {
    # reference binarizer_cls names (`data_gen/singing/binarize.py`,
    # `train_m4singer/binarize.py`) -> this framework's classes
    "data_gen.singing.binarize.SingingBinarizer": "bisinger_tpu.data.binarizer.SingingBinarizer",
    "data_gen.singing.binarize.M4SingerBinarizer": "bisinger_tpu.data.binarizer.M4SingerBinarizer",
    "data_gen.singing.binarize.MidiSingingBinarizer": "bisinger_tpu.data.binarizer.MidiSingingBinarizer",
    "data_gen.singing.binarize.ZhSingingBinarizer": "bisinger_tpu.data.binarizer.ZhBinarizer",
    "data_gen.tts.binarizer_zh.ZhBinarizer": "bisinger_tpu.data.binarizer.ZhBinarizer",
}


def resolve_task_cls(path: str):
    path = TASK_ALIASES.get(path, path) or "bisinger_tpu.training.tasks.DiffSingerMIDITask"
    module, name = path.rsplit(".", 1)
    return getattr(importlib.import_module(module), name)


def resolve_binarizer_cls(path: str):
    path = BINARIZER_ALIASES.get(path, path) or "bisinger_tpu.data.binarizer.M4SingerBinarizer"
    module, name = path.rsplit(".", 1)
    return getattr(importlib.import_module(module), name)


def main(argv=None):
    _honor_jax_platforms_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="")
    parser.add_argument("--exp_name", type=str, default="default")
    parser.add_argument("--hparams", type=str, default="")
    parser.add_argument("--binarize", action="store_true")
    parser.add_argument("--infer", action="store_true")
    parser.add_argument("--input", type=str, default="", help="score json for --infer")
    parser.add_argument("--out", type=str, default="infer_out")
    parser.add_argument("--max_updates", type=int, default=0)
    parser.add_argument(
        "--reset",
        action="store_true",
        help="ignore the config saved in the work dir (reference --reset)",
    )
    parser.add_argument(
        "--validate",
        action="store_true",
        help="run validation on the latest checkpoint and exit",
    )
    args = parser.parse_args(argv)

    import json

    from bisinger_tpu.config import load_hparams

    hp = load_hparams(args.config or None, args.hparams or None)
    work_dir = os.path.join("checkpoints", args.exp_name)
    # precedence (reference hparams.py:69-96): experiment config < saved
    # work-dir config (unless --reset) < --hparams overrides
    saved_cfg = os.path.join(work_dir, "config.json")
    if not args.reset and os.path.exists(saved_cfg):
        with open(saved_cfg) as f:
            hp = hp.merged(json.load(f))
        if args.hparams:
            hp = load_hparams(overrides=args.hparams, base=hp)
    hp = hp.replace(exp_name=args.exp_name, work_dir=work_dir, infer=args.infer)

    if args.binarize:
        binarizer_cls = resolve_binarizer_cls(hp.get("binarizer_cls"))
        binarizer_cls(hp).process()
        return 0

    if args.infer:
        from bisinger_tpu.inference.pipeline import SVSInfer
        from bisinger_tpu.vocoders.hifigan import HifiGAN

        vocoder = HifiGAN(hp) if hp.get("vocoder_ckpt") else None
        infer = SVSInfer.from_work_dir(hp, work_dir, vocoder=vocoder)
        if not args.input:
            print("--infer requires --input scores.json", file=sys.stderr)
            return 2
        paths = infer.infer_from_json(args.input, args.out)
        for p in paths:
            print(p)
        return 0

    # train
    from bisinger_tpu.training.trainer import Trainer
    from bisinger_tpu.utils.text_encoder import build_phone_encoder

    encoder = build_phone_encoder(hp["binary_data_dir"])
    task_cls = resolve_task_cls(hp.get("task_cls", ""))
    from bisinger_tpu.training.tasks import PitchExtractionTask

    if task_cls is PitchExtractionTask:
        task = task_cls(hp)
    else:
        task = task_cls(hp, encoder.vocab_size)
    trainer = Trainer(task, hp)
    if args.validate:
        val_loss = trainer.validate()
        print(f"| validate: total_loss={val_loss:.4f}")
        return 0
    trainer.fit(max_updates=args.max_updates or None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
