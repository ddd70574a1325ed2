"""Flagship-scale training: the full m4-detect-ori-shift recipe at
production dims on one chip, to a REAL checkpoint.

Every quality-bearing number in BASELINE.md used to rest on random-init
weights (round-4 verdict #1). This script runs the reference's actual
three-stage recipe (`/root/reference/doc/train.md:10-31`: FFT-Singer ->
PitchExtractor -> warm-started shallow diffusion, plus the NSF HiFi-GAN
vocoder) at the PRODUCTION model size resolved by the real config
cascade (`configs/usr/m4-detect-ori-shift/{fs2,diff}.yaml`: hidden 256,
4+4 FFT layers, 20x256 DiffNet, K=1000 linear schedule) on the richest
corpus constructible in-env (the deterministic bilingual synthetic
corpus), then exports params-only npz checkpoints that bench.py
(BENCH_CKPT), scripts/sampler_quality.py (SQ_CKPT), and the wav
artifact path all load.

Step budgets are scaled-down reference budgets (320k/900k is ~4 chip-
days; one round has ~6 chip-hours), but the MODEL is full size — the
point is trained-weights numerics (PLMS x0 extrapolation range, NSF uv
gating rates), not leaderboard quality.

Run:  python scripts/train_flagship.py          (real chip)
Env:  FL_PLATFORM (axon)  FL_ITEMS (512)  FL_OUT (/tmp/bisinger_flagship)
      FL_FS2_STEPS (35000)  FL_PE_STEPS (6000)  FL_DIFF_STEPS (35000)
      FL_VOC_STEPS (12000)  FL_EXPORT (artifacts/flagship)
      FL_STAGES (fs2,pe,diff,voc,voc_mb)  — subset to rerun one stage

Stages resume from their work-dir checkpoints if interrupted (trainer
restores latest and continues), so rerunning the script is always safe.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg):
    print(f"[flagship] {msg}", file=sys.stderr, flush=True)


def masked_mel_mae(mel_pred, mel_gt, mel2ph):
    import numpy as np

    mask = (np.asarray(mel2ph) > 0)[:, :, None]
    diff = np.abs(np.asarray(mel_pred) - np.asarray(mel_gt)) * mask
    return float(diff.sum() / max(mask.sum() * mel_gt.shape[-1], 1))


def export_params(params, path):
    """Params-only npz (same flat format the vocoder checkpoints use)."""
    import jax
    import numpy as np

    from bisinger_tpu.vocoders.hifigan import flatten_params

    os.makedirs(os.path.dirname(path), exist_ok=True)
    flat = flatten_params(jax.device_get(params))
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})
    log(f"exported {len(flat)} tensors -> {path}")


def corpus_overrides(out_dir, n_items):
    batch = int(os.environ.get("FL_BATCH", 48))
    return dict(
        raw_data_dir=os.path.join(out_dir, "raw"),
        raw_json_fn="meta.json",
        binary_data_dir=os.path.join(out_dir, "binary"),
        test_prefixes=["Alto-1#song0"],
        # corpus items are 0.8-2.6 s (150-500 frames, <=13 tokens):
        # one static bucket keeps a single compiled program; B=48 x
        # T=512 is ~the bench_train 24x1024 frame budget per step
        bucket_tokens=[16],
        bucket_frames=[512],
        max_tokens=1_000_000,
        max_sentences=batch,
        max_eval_sentences=max(batch // 2, 1),
        max_words=32,
        num_sanity_val_steps=1,
        num_ckpt_keep=2,
        save_codes=False,
        # zero per-step H2D: the axon tunnel client leaks host memory
        # proportional to every upload (~8 MB/step at this batch — a
        # 30k-step streaming run was OOM-killed at 130 GB RSS); the
        # device-resident corpus gathers batches on device instead
        # (data/device_corpus.py), leak measured ~2 KB/step
        device_resident_corpus=bool(int(os.environ.get("FL_DEVCORPUS", 1))),
    )


def main():
    platform = os.environ.get("FL_PLATFORM", "axon")
    n_items = int(os.environ.get("FL_ITEMS", 512))
    out_dir = os.path.abspath(os.environ.get("FL_OUT", "/tmp/bisinger_flagship"))
    export_dir = os.path.abspath(
        os.environ.get("FL_EXPORT", os.path.join(REPO, "artifacts", "flagship"))
    )
    fs2_steps = int(os.environ.get("FL_FS2_STEPS", 35000))
    pe_steps = int(os.environ.get("FL_PE_STEPS", 6000))
    diff_steps = int(os.environ.get("FL_DIFF_STEPS", 35000))
    voc_steps = int(os.environ.get("FL_VOC_STEPS", 12000))
    stages = os.environ.get("FL_STAGES", "fs2,pe,diff,voc,voc_mb").split(",")

    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/bisinger_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.data.binarizer import M4SingerBinarizer
    from bisinger_tpu.data.dataset import DataLoader, M4SingerDataset
    from bisinger_tpu.data.synthetic import make_synthetic_corpus
    from bisinger_tpu.training.tasks import (
        AuxDecoderMIDITask,
        DiffSingerMIDITask,
        PitchExtractionTask,
    )
    from bisinger_tpu.training.trainer import Trainer, device_batch
    from bisinger_tpu.utils.text_encoder import build_phone_encoder

    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(export_dir, exist_ok=True)
    summary_path = os.path.join(export_dir, "summary.json")
    summary = {}
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            summary = json.load(f)
    summary.update(
        platform=platform, n_items=n_items,
        steps=dict(fs2=fs2_steps, pe=pe_steps, diff=diff_steps, voc=voc_steps),
    )

    def save_summary():
        with open(summary_path, "w") as f:
            json.dump(summary, f, indent=2)

    # ---- corpus + binarize (deterministic; reproducible by seed) ----------
    raw = os.path.join(out_dir, "raw")
    if not os.path.exists(os.path.join(raw, "meta.json")):
        make_synthetic_corpus(raw, n_items=n_items, seed=0)
        log(f"synthetic corpus: {n_items} items")
    over = corpus_overrides(out_dir, n_items)
    hp_fs2 = load_hparams(
        os.path.join(REPO, "configs/usr/m4-detect-ori-shift/fs2.yaml"),
        overrides=dict(
            over,
            work_dir=os.path.join(out_dir, "fs2"),
            max_updates=fs2_steps,
            val_check_interval=2000,
            pitch_extractor="parselmouth",  # built-in Boersma tracker
        ),
    )
    if not os.path.exists(os.path.join(hp_fs2["binary_data_dir"], "phone_set.json")):
        t0 = time.time()
        M4SingerBinarizer(hp_fs2).process()
        log(f"binarized in {time.time() - t0:.0f}s")
    encoder = build_phone_encoder(hp_fs2["binary_data_dir"])
    vocab = encoder.vocab_size
    with open(os.path.join(export_dir, "hparams_fs2.json"), "w") as f:
        json.dump(hp_fs2.to_dict(), f, indent=2, default=str)

    # fixed validation batch for before/after quality probes
    val_ds = M4SingerDataset(hp_fs2, "valid")
    val_batch = device_batch(next(iter(DataLoader(val_ds, hp_fs2, shuffle=False))))
    probe_rng = jax.random.PRNGKey(0)

    # ---- stage 1: FFT-Singer ----------------------------------------------
    task_fs2 = AuxDecoderMIDITask(hp_fs2, vocab)
    if "fs2" in stages:
        t0 = time.time()
        state0 = task_fs2.init_state(jax.random.PRNGKey(42), val_batch)
        mel0 = task_fs2._forward(state0.params, val_batch, probe_rng, deterministic=True)
        mae0 = masked_mel_mae(mel0["mel_out"], val_batch["mels"], val_batch["mel2ph"])
        del state0, mel0
        tr = Trainer(task_fs2, hp_fs2)
        state = tr.fit()
        mel1 = task_fs2._forward(state.params, val_batch, probe_rng, deterministic=True)
        summary["fs2"] = {
            "steps": int(state.step),
            "teacher_forced_mae_step0": mae0,
            "teacher_forced_mae_final": masked_mel_mae(
                mel1["mel_out"], val_batch["mels"], val_batch["mel2ph"]
            ),
            "wall_h": round((time.time() - t0) / 3600, 2),
        }
        export_params(state.params, os.path.join(export_dir, "fs2_params.npz"))
        del state, mel1
        save_summary()
        log(f"fs2 done: {summary['fs2']}")

    # ---- stage 1.5: PitchExtractor (mel -> f0/uv for NSF vocoding) --------
    hp_pe = load_hparams(
        os.path.join(REPO, "configs/tts/pe.yaml"),
        overrides=dict(
            over,
            work_dir=os.path.join(out_dir, "pe"),
            max_updates=pe_steps,
            val_check_interval=1000,
            pitch_extractor="parselmouth",
        ),
    )
    if "pe" in stages:
        t0 = time.time()
        from bisinger_tpu.utils.pitch import denorm_f0

        task_pe = PitchExtractionTask(hp_pe)

        def pe_f0_mae(state):
            ret = task_pe.infer_step(
                {"params": state.params, "batch_stats": state.batch_stats},
                val_batch["mels"],
            )
            gt = denorm_f0(
                val_batch["f0"], val_batch["uv"], hp_pe["pitch_norm"],
                use_uv=hp_pe["use_uv"],
            )
            voiced = (np.asarray(val_batch["uv"]) == 0) & (
                np.asarray(val_batch["mel2ph"]) > 0
            )
            err = np.abs(np.asarray(ret["f0_denorm_pred"]) - np.asarray(gt))
            return float(err[voiced].mean())

        state0 = task_pe.init_state(jax.random.PRNGKey(42), val_batch)
        mae0 = pe_f0_mae(state0)
        del state0
        tr = Trainer(task_pe, hp_pe)
        state = tr.fit()
        summary["pe"] = {
            "steps": int(state.step),
            "val_f0_mae_hz_step0": mae0,
            "val_f0_mae_hz_final": pe_f0_mae(state),
            "wall_h": round((time.time() - t0) / 3600, 2),
        }
        export_params(state.params, os.path.join(export_dir, "pe_params.npz"))
        del state
        save_summary()
        log(f"pe done: {summary['pe']}")

    # ---- stage 2: shallow diffusion, warm-started from stage 1 ------------
    hp_diff = load_hparams(
        os.path.join(REPO, "configs/usr/m4-detect-ori-shift/diff.yaml"),
        overrides=dict(
            over,
            work_dir=os.path.join(out_dir, "diff"),
            max_updates=diff_steps,
            val_check_interval=2000,
            pitch_extractor="parselmouth",
            fs2_ckpt=os.path.join(out_dir, "fs2"),
            # scale the reference's lr decay + midi->f0 curriculum switch
            # (160k of 900k ~ 18%) to this budget
            decay_steps=max(diff_steps // 2, 1000),
            switch_midi2f0_step=max(int(diff_steps * 0.18), 100),
            pe_ckpt="",
        ),
    )
    with open(os.path.join(export_dir, "hparams_diff.json"), "w") as f:
        json.dump(hp_diff.to_dict(), f, indent=2, default=str)
    if "diff" in stages:
        t0 = time.time()
        task_diff = DiffSingerMIDITask(hp_diff, vocab)

        def sample_mae(params):
            from bisinger_tpu.training.tasks import _model_kwargs

            kwargs = _model_kwargs(val_batch, hp_diff)
            k_rng = jax.random.PRNGKey(7)
            ret = task_diff.model.apply(
                {"params": params}, **kwargs, infer=True,
                rng=k_rng, rngs={"diffusion": k_rng},
            )
            return masked_mel_mae(ret["mel_out"], val_batch["mels"], val_batch["mel2ph"])

        tr = Trainer(task_diff, hp_diff)
        state = tr.fit()
        summary["diffusion"] = {
            "steps": int(state.step),
            "sampled_mae_final": sample_mae(state.params),
            "wall_h": round((time.time() - t0) / 3600, 2),
        }
        export_params(state.params, os.path.join(export_dir, "diff_params.npz"))
        del state
        save_summary()
        log(f"diffusion done: {summary['diffusion']}")

    # ---- stage 3: NSF HiFi-GAN vocoder at production width ------------------
    # train_vocoder.py's adversarial loop on harmonic clips; 512-channel
    # generator = the bench/serving `upsample_initial_channel`. Full-band
    # (parity mode weights) + PQMF-4 multiband (fast-mode weights).
    for stage, mb in (("voc", 1), ("voc_mb", 4)):
        if stage not in stages:
            continue
        t0 = time.time()
        voc_out = os.path.join(export_dir, "vocoder" + ("_mb4" if mb == 4 else ""))
        env = dict(
            os.environ,
            TV_PLATFORM=platform,
            TV_STEPS=str(voc_steps),
            TV_BATCH="8",
            TV_FRAMES="64",
            TV_CHANNELS="512",
            TV_MULTIBAND=str(mb),
            TV_OUT=voc_out,
        )
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "train_vocoder.py")],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        tail = "\n".join(r.stdout.strip().splitlines()[-12:])
        log(f"{stage} rc={r.returncode}:\n{tail}")
        last_json = None
        for line in r.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    last_json = json.loads(line)
                except json.JSONDecodeError:
                    pass
        summary[stage] = {
            "rc": r.returncode,
            "wall_h": round((time.time() - t0) / 3600, 2),
            "result": last_json,
        }
        save_summary()

    save_summary()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
