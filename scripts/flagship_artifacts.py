"""Post-training flagship artifacts (round-4 verdict #1d).

After scripts/train_flagship.py finishes, this script:
  1. exports the PitchExtractor's BatchNorm running stats
     (pe_batch_stats.npz) from the PE stage's orbax checkpoint — the
     stage export is params-only, but PE inference needs the running
     stats (`modules/fastspeech/pe.py:18` parity);
  2. synthesizes validation-set utterances through the FULL trained
     production path (FastSpeech2MIDI conditioner -> 200-NFE PLMS
     shallow diffusion -> trained PE f0 -> trained NSF HiFi-GAN) and
     writes wav artifacts + a quality summary (mel MAE vs ground truth
     on predicted-duration AND gt-duration paths) into
     artifacts/flagship/samples/.

Run:  python scripts/flagship_artifacts.py
Env:  FA_PLATFORM (axon)  FA_CKPT (artifacts/flagship)
      FA_DATA (/tmp/bisinger_flagship)  FA_N (4 utterances)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg):
    print(f"[fa] {msg}", file=sys.stderr, flush=True)


def main():
    platform = os.environ.get("FA_PLATFORM", "axon")
    ckpt = os.path.abspath(os.environ.get("FA_CKPT", os.path.join(REPO, "artifacts", "flagship")))
    data_root = os.environ.get("FA_DATA", "/tmp/bisinger_flagship")
    n_utts = int(os.environ.get("FA_N", 4))

    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/bisinger_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.data.dataset import DataLoader, M4SingerDataset
    from bisinger_tpu.models.hifigan import HifiGanGenerator
    from bisinger_tpu.models.pe import PitchExtractor
    from bisinger_tpu.training.checkpoints import CheckpointManager
    from bisinger_tpu.training.tasks import DiffSingerMIDITask, PitchExtractionTask
    from bisinger_tpu.training.trainer import device_batch
    from bisinger_tpu.utils.audio import save_wav
    from bisinger_tpu.utils.text_encoder import build_phone_encoder
    from bisinger_tpu.vocoders.hifigan import flatten_params, unflatten_params

    with open(os.path.join(ckpt, "hparams_diff.json")) as f:
        fhp = json.load(f)
    fhp.update(
        raw_data_dir=os.path.join(data_root, "raw"),
        binary_data_dir=os.path.join(data_root, "binary"),
        max_sentences=n_utts,
        max_eval_sentences=n_utts,
        diff_sampler="plms",
        pndm_speedup=5,  # production 200-NFE parity sampler
    )
    hp = load_hparams(overrides=fhp)
    vocab = build_phone_encoder(hp["binary_data_dir"]).vocab_size

    # ---- 1. PE batch_stats export -----------------------------------------
    stats_fn = os.path.join(ckpt, "pe_batch_stats.npz")
    pe_dir = os.path.join(data_root, "pe")
    if not os.path.exists(stats_fn) and os.path.isdir(os.path.join(pe_dir, "ckpt")):
        hp_pe = load_hparams(
            os.path.join(REPO, "configs/tts/pe.yaml"),
            overrides=dict(
                binary_data_dir=os.path.join(data_root, "binary"),
                work_dir=pe_dir,
            ),
        )
        task_pe = PitchExtractionTask(hp_pe)
        t = 8
        dummy = {
            "mels": np.zeros((1, t, hp["audio_num_mel_bins"]), np.float32),
            "f0": np.zeros((1, t), np.float32),
            "uv": np.zeros((1, t), np.float32),
        }
        st = task_pe.init_state(jax.random.PRNGKey(0), dummy)
        restored = CheckpointManager(os.path.join(pe_dir, "ckpt")).restore(
            jax.device_get(st)
        )
        assert restored is not None, f"no PE checkpoint under {pe_dir}"
        flat = flatten_params(jax.device_get(restored.batch_stats))
        np.savez(stats_fn, **{k: np.asarray(v) for k, v in flat.items()})
        log(f"exported PE batch_stats ({len(flat)} tensors) -> {stats_fn}")

    # ---- 2. trained-path synthesis ----------------------------------------
    params = unflatten_params(
        dict(np.load(os.path.join(ckpt, "diff_params.npz"), allow_pickle=False))
    )
    pe_vars = {
        "params": unflatten_params(
            dict(np.load(os.path.join(ckpt, "pe_params.npz"), allow_pickle=False))
        )
    }
    if os.path.exists(stats_fn):
        pe_vars["batch_stats"] = unflatten_params(
            dict(np.load(stats_fn, allow_pickle=False))
        )
    import glob

    voc_npz = sorted(
        glob.glob(os.path.join(ckpt, "vocoder", "**", "generator_*.npz"), recursive=True)
    )
    assert voc_npz, f"no trained vocoder under {ckpt}/vocoder"
    voc_params = unflatten_params(dict(np.load(voc_npz[-1], allow_pickle=False)))
    # the vocoder was trained with its own (full-band NSF) topology
    vhp = hp.replace(
        upsample_rates=[8, 4, 2, 2],
        upsample_kernel_sizes=[16, 8, 4, 4],
        upsample_initial_channel=512,
        use_nsf=True,
        vocoder_multiband=1,
    )

    task = DiffSingerMIDITask(hp, vocab_size=vocab)
    pe = PitchExtractor(hp=hp)
    voc = HifiGanGenerator(hp=vhp)

    val_ds = M4SingerDataset(hp, "valid", shuffle=False)
    vbatch = device_batch(next(iter(DataLoader(val_ds, hp, shuffle=False))))
    out_dir = os.path.join(ckpt, "samples")
    os.makedirs(out_dir, exist_ok=True)
    rng = jax.random.PRNGKey(7)

    from bisinger_tpu.training.tasks import _model_kwargs

    summary = {"sampler": "plms-200", "vocoder_npz": voc_npz[-1], "utts": []}
    for mode in ("gt_dur", "pred_dur"):
        kwargs = _model_kwargs(vbatch, hp)
        if mode == "pred_dur":
            kwargs["mel2ph"] = None
            kwargs["max_frames"] = int(vbatch["mels"].shape[1])
        t0 = time.time()
        ret = task.model.apply(
            {"params": params}, **kwargs, infer=True, rng=rng, rngs={"diffusion": rng}
        )
        mel = np.asarray(ret["mel_out"])
        f0 = pe.apply(pe_vars, ret["mel_out"])["f0_denorm_pred"]
        wav = np.asarray(
            voc.apply(
                {"params": voc_params}, ret["mel_out"], f0,
                rngs={"nsf": jax.random.fold_in(rng, 1)},
            )
        )
        log(f"{mode}: synthesized {mel.shape} in {time.time() - t0:.1f}s")
        mask = (np.asarray(vbatch["mel2ph"]) > 0)[:, :, None]
        gt = np.asarray(vbatch["mels"])
        if mode == "gt_dur":
            mae = float((np.abs(mel - gt) * mask).sum() / (mask.sum() * gt.shape[-1]))
            summary["mel_mae_vs_gt_gt_dur"] = round(mae, 4)
        for i in range(min(n_utts, wav.shape[0])):
            w = wav[i].squeeze()
            path = os.path.join(out_dir, f"{mode}_{i}.wav")
            save_wav(w, path, hp["audio_sample_rate"])
            summary["utts"].append(
                {"path": os.path.relpath(path, REPO), "mode": mode,
                 "sec": round(len(w) / hp["audio_sample_rate"], 2)}
            )
    # ground-truth mel through the trained vocoder: isolates vocoder quality
    gt_f0 = pe.apply(pe_vars, vbatch["mels"])["f0_denorm_pred"]
    gt_wav = np.asarray(
        voc.apply(
            {"params": voc_params}, vbatch["mels"], gt_f0,
            rngs={"nsf": jax.random.fold_in(rng, 2)},
        )
    )
    for i in range(min(n_utts, gt_wav.shape[0])):
        save_wav(
            gt_wav[i].squeeze(),
            os.path.join(out_dir, f"copysynth_{i}.wav"),
            hp["audio_sample_rate"],
        )
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    sys.exit(main())
