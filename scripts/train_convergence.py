"""Miniature end-to-end convergence demonstration.

The reference's whole QA story is "train it and listen"
(`/root/reference/doc/train.md:10-31`: 320k fs2 steps + 900k diffusion
steps). This script proves the framework *trains*, not merely steps:

  synthetic corpus -> binarize -> fs2 (FFT-Singer) N steps
  -> warm-start shallow diffusion N steps -> teacher-forced sampling
  -> vocode,

and reports (a) first-window vs last-window training losses for both
stages, (b) teacher-forced mel MAE of the trained model vs its step-0
init, (c) a wav artifact. Loss curves land in <out>/curves_{fs2,diff}.json.

Run:  python scripts/train_convergence.py            (CPU by default)
Env:  TC_STEPS (2000)  TC_ITEMS (64)  TC_HIDDEN (64)  TC_OUT (dir)
      TC_PLATFORM (cpu; set axon/tpu to run on the chip)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[convergence] {msg}", file=sys.stderr, flush=True)


def masked_mel_mae(mel_pred, mel_gt, mel2ph):
    import numpy as np

    mask = (np.asarray(mel2ph) > 0)[:, :, None]
    diff = np.abs(np.asarray(mel_pred) - np.asarray(mel_gt)) * mask
    return float(diff.sum() / np.maximum(mask.sum() * mel_gt.shape[-1], 1))


class RecordingTrainer:
    """Trainer subclass factory recording every logged metric row."""

    def __new__(cls, *a, **k):
        from bisinger_tpu.training.trainer import Trainer

        class _T(Trainer):
            def __init__(self, *args, **kwargs):
                super().__init__(*args, **kwargs)
                self.history = []

            def log(self, metrics, prefix="tr"):
                self.history.append(
                    {"step": self.global_step, "prefix": prefix, **metrics}
                )
                super().log(metrics, prefix)

        return _T(*a, **k)


def window_avg(history, key, prefix="tr", first=True, k=5):
    rows = [h[key] for h in history if h["prefix"] == prefix and key in h]
    rows = rows[:k] if first else rows[-k:]
    return sum(rows) / max(len(rows), 1)


def main():
    platform = os.environ.get("TC_PLATFORM", "cpu")
    steps = int(os.environ.get("TC_STEPS", 2000))
    n_items = int(os.environ.get("TC_ITEMS", 64))
    hidden = int(os.environ.get("TC_HIDDEN", 64))
    out_dir = os.path.abspath(
        os.environ.get("TC_OUT", "/tmp/bisinger_convergence")
    )

    import jax

    if platform:
        jax.config.update("jax_platforms", platform)

    import numpy as np

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.data.binarizer import M4SingerBinarizer
    from bisinger_tpu.data.dataset import DataLoader, M4SingerDataset
    from bisinger_tpu.data.synthetic import make_synthetic_corpus
    from bisinger_tpu.training.tasks import AuxDecoderMIDITask, DiffSingerMIDITask
    from bisinger_tpu.training.trainer import device_batch
    from bisinger_tpu.utils.text_encoder import build_phone_encoder

    os.makedirs(out_dir, exist_ok=True)
    raw = os.path.join(out_dir, "raw")
    if not os.path.exists(os.path.join(raw, "meta.json")):
        make_synthetic_corpus(raw, n_items=n_items, seed=0)
        log(f"synthetic corpus: {n_items} items under {raw}")

    base = dict(
        raw_data_dir=raw,
        raw_json_fn="meta.json",
        binary_data_dir=os.path.join(out_dir, "binary"),
        num_spk=4,
        test_prefixes=["Alto-1#song0"],
        pitch_extractor="autocorr",
        # small-but-real model: enough capacity to visibly learn on CPU
        hidden_size=hidden,
        enc_layers=2,
        dec_layers=2,
        enc_ffn_kernel_size=9,
        dec_ffn_kernel_size=9,
        residual_layers=10,
        residual_channels=hidden,
        timesteps=100,
        K_step=100,
        max_beta=0.06,
        predictor_layers=2,
        dur_predictor_layers=2,
        use_pitch_embed=True,
        bucket_tokens=[16],
        bucket_frames=[768],
        max_tokens=5000,
        max_sentences=8,
        max_words=32,
        max_updates=steps,
        log_interval=max(steps // 40, 10),
        val_check_interval=max(steps // 4, 50),
        num_sanity_val_steps=1,
        num_ckpt_keep=1,
        warmup_updates=min(200, steps // 4),
        lr=1.0,  # rsqrt scale for fs2; diffusion stage overrides below
        clip_grad_norm=1.0,
        save_codes=False,
    )
    hp_fs2 = load_hparams(
        overrides=dict(base, work_dir=os.path.join(out_dir, "fs2"))
    )
    if not os.path.exists(os.path.join(hp_fs2["binary_data_dir"], "phone_set.json")):
        M4SingerBinarizer(hp_fs2).process()
        log("binarized")
    vocab = build_phone_encoder(hp_fs2["binary_data_dir"]).vocab_size

    # one fixed validation batch for teacher-forced MAE probes
    val_ds = M4SingerDataset(hp_fs2, "valid")
    val_batch = device_batch(
        next(iter(DataLoader(val_ds, hp_fs2, shuffle=False)))
    )
    rng = jax.random.PRNGKey(0)

    summary = {"steps": steps, "n_items": n_items, "hidden": hidden,
               "platform": platform}

    # ---- stage 1: FFT-Singer ----------------------------------------------
    t0 = time.time()
    task1 = AuxDecoderMIDITask(hp_fs2, vocab)
    state0 = task1.init_state(jax.random.PRNGKey(42), val_batch)
    # teacher-forced forward at step 0 (gt durations + f0)
    mel0 = task1._forward(state0.params, val_batch, rng, deterministic=True)
    mae_fs2_0 = masked_mel_mae(mel0["mel_out"], val_batch["mels"], val_batch["mel2ph"])

    tr1 = RecordingTrainer(task1, hp_fs2)
    state1 = tr1.fit()
    mel1 = task1._forward(state1.params, val_batch, rng, deterministic=True)
    mae_fs2_1 = masked_mel_mae(mel1["mel_out"], val_batch["mels"], val_batch["mel2ph"])
    summary["fs2"] = {
        "total_loss_first": window_avg(tr1.history, "total_loss", first=True),
        "total_loss_last": window_avg(tr1.history, "total_loss", first=False),
        "l1_first": window_avg(tr1.history, "l1", first=True),
        "l1_last": window_avg(tr1.history, "l1", first=False),
        "teacher_forced_mae_step0": mae_fs2_0,
        "teacher_forced_mae_final": mae_fs2_1,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(out_dir, "curves_fs2.json"), "w") as f:
        json.dump(tr1.history, f)
    log(f"fs2 stage: {summary['fs2']}")

    # ---- stage 1.5: PitchExtractor (mel -> f0/uv) ---------------------------
    # the PE drives the NSF vocoder at inference (reference
    # `tasks/tts/pe.py:103-157`); train it on the same corpus and probe
    # voiced-frame f0 MAE in Hz against the ground-truth track
    t0 = time.time()
    from bisinger_tpu.training.tasks import PitchExtractionTask
    from bisinger_tpu.utils.pitch import denorm_f0

    hp_pe = load_hparams(
        overrides=dict(base, work_dir=os.path.join(out_dir, "pe"))
    )
    task_pe = PitchExtractionTask(hp_pe)
    state_pe0 = task_pe.init_state(jax.random.PRNGKey(42), val_batch)

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

    mae_pe_0 = pe_f0_mae(state_pe0)
    tr_pe = RecordingTrainer(task_pe, hp_pe)
    state_pe = tr_pe.fit()
    mae_pe_1 = pe_f0_mae(state_pe)
    summary["pe"] = {
        "total_loss_first": window_avg(tr_pe.history, "total_loss", first=True),
        "total_loss_last": window_avg(tr_pe.history, "total_loss", first=False),
        "val_f0_mae_hz_step0": mae_pe_0,
        "val_f0_mae_hz_final": mae_pe_1,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(out_dir, "curves_pe.json"), "w") as f:
        json.dump(tr_pe.history, f)
    log(f"pe stage: {summary['pe']}")

    # ---- stage 2: shallow diffusion, warm-started from stage 1 ------------
    t0 = time.time()
    hp_diff = load_hparams(
        overrides=dict(
            base,
            work_dir=os.path.join(out_dir, "diff"),
            fs2_ckpt=os.path.join(out_dir, "fs2"),
            lr=1e-3,
            decay_steps=max(steps // 2, 100),
        )
    )
    task2 = DiffSingerMIDITask(hp_diff, vocab)
    state2_0 = task2.init_state(jax.random.PRNGKey(42), val_batch)

    def sample_teacher_forced(params):
        """Shallow-diffusion sampling with gt durations/f0 (the diffusion
        counterpart of a teacher-forced decode)."""
        from bisinger_tpu.training.tasks import _model_kwargs

        kwargs = _model_kwargs(val_batch, hp_diff)
        kwargs_rng = jax.random.PRNGKey(7)
        ret = task2.model.apply(
            {"params": params}, **kwargs, infer=True,
            rng=kwargs_rng, rngs={"diffusion": kwargs_rng},
        )
        return masked_mel_mae(ret["mel_out"], val_batch["mels"], val_batch["mel2ph"])

    mae_diff_0 = sample_teacher_forced(state2_0.params)
    tr2 = RecordingTrainer(task2, hp_diff)
    state2 = tr2.fit()
    mae_diff_1 = sample_teacher_forced(state2.params)
    summary["diffusion"] = {
        "mel_first": window_avg(tr2.history, "mel", first=True),
        "mel_last": window_avg(tr2.history, "mel", first=False),
        "sampled_mae_step0": mae_diff_0,
        "sampled_mae_final": mae_diff_1,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(out_dir, "curves_diff.json"), "w") as f:
        json.dump(tr2.history, f)
    log(f"diffusion stage: {summary['diffusion']}")

    # ---- stage 3: vocode the sampled mel -----------------------------------
    # TC_VOC points at a trained generator checkpoint dir (e.g. the
    # output of scripts/train_vocoder.py); TC_VOC_CHANNELS must match
    # that generator's upsample_initial_channel. Without TC_VOC the wav
    # is a random-vocoder plumbing artifact.
    try:
        from bisinger_tpu.vocoders.hifigan import HifiGAN

        voc_dir = os.environ.get("TC_VOC", "")
        hp_voc = hp_diff
        if voc_dir:
            hp_voc = hp_diff.replace(
                vocoder_ckpt=voc_dir,
                upsample_initial_channel=int(
                    os.environ.get("TC_VOC_CHANNELS", 128)
                ),
            )
        voc = HifiGAN(hp_voc)
        ret = task2.infer_step(state2.params, val_batch, jax.random.PRNGKey(3))
        mel = np.asarray(ret["mel_out"])[0]
        f0 = np.asarray(ret.get("f0_denorm", val_batch["f0"]))[0]
        wav = voc.spec2wav(mel, f0[: mel.shape[0]])
        from bisinger_tpu.utils.audio import save_wav

        wav_path = os.path.join(out_dir, "sample.wav")
        save_wav(np.asarray(wav), wav_path, hp_diff["audio_sample_rate"])
        summary["wav"] = wav_path
        summary["wav_vocoder_trained"] = bool(voc_dir and voc.loaded)
        if voc_dir and not voc.loaded:
            log(f"WARNING: TC_VOC={voc_dir} set but no checkpoint loaded")
        log(f"vocoded sample -> {wav_path}"
            + ("" if summary["wav_vocoder_trained"] else
               " (vocoder weights are untrained — plumbing artifact, "
               "not quality)"))
    except Exception as e:
        summary["wav_error"] = str(e)
        log(f"vocode step skipped: {e}")

    # Convergence bars. The fs2 regression losses should collapse; the
    # diffusion ε-prediction loss has a HIGH IRREDUCIBLE FLOOR (the
    # denoiser predicts unit Gaussian noise from a noised mel, so even a
    # perfect model keeps most of the loss at large t) — a 15% drop in a
    # miniature run is material; the end-to-end quality signal for that
    # stage is the SAMPLED mel MAE. TC_SMOKE=1 (CI) only requires every
    # signal to move the right way.
    smoke = os.environ.get("TC_SMOKE") == "1"
    f_loss, f_mae, d_loss, d_mae, p_loss, p_mae = (
        (0.995, 0.995, 0.999, 0.98, 0.995, 0.995)
        if smoke
        else (0.7, 0.8, 0.85, 0.8, 0.8, 0.8)
    )
    summary["converged"] = bool(
        summary["fs2"]["total_loss_last"]
        < f_loss * summary["fs2"]["total_loss_first"]
        and summary["fs2"]["teacher_forced_mae_final"]
        < f_mae * summary["fs2"]["teacher_forced_mae_step0"]
        and summary["diffusion"]["mel_last"]
        < d_loss * summary["diffusion"]["mel_first"]
        and summary["diffusion"]["sampled_mae_final"]
        < d_mae * summary["diffusion"]["sampled_mae_step0"]
        and summary["pe"]["total_loss_last"]
        < p_loss * summary["pe"]["total_loss_first"]
        and summary["pe"]["val_f0_mae_hz_final"]
        < p_mae * summary["pe"]["val_f0_mae_hz_step0"]
    )
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0 if summary["converged"] else 1


if __name__ == "__main__":
    sys.exit(main())
