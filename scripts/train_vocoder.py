"""HiFi-GAN vocoder GAN stability run + trained-generator round-trip.

The reference ships HiFi-GAN discriminators but no vocoder training task
(`configs/tts/hifigan.yaml:2` references an absent `tasks/vocoder/*`);
this framework implements one (`training/vocoder_task.py`). This script
demonstrates it actually TRAINS: several hundred adversarial steps on
synthetic harmonic audio, checking

  - no NaN anywhere,
  - D/G loss balance stays sane (disc neither collapses to 0 nor blows
    up; generator mel loss drops materially),
  - the trained generator round-trips through the `vocoders/hifigan.py`
    checkpoint glob (`generator_*.npz`) and vocodes a held-out mel with
    lower mel-L1 than its random init.

Run:  python scripts/train_vocoder.py               (CPU by default)
Env:  TV_STEPS (400)  TV_BATCH (4)  TV_FRAMES (32)  TV_OUT (dir)
      TV_PLATFORM (cpu; axon/tpu for the chip)  TV_CHANNELS (64)
      TV_MULTIBAND (1; 4 = train the PQMF fast mode: generator emits 4
      subbands, discriminators/losses see the PQMF-synthesized wav)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[train_vocoder] {msg}", file=sys.stderr, flush=True)


def build_windows(hp, n_clips, frames, rng):
    """Synthetic harmonic clips -> (mel, f0, wav) random training windows.

    f0 frames are exact (derived from the rendered note grid), so the NSF
    source gets clean conditioning — this isolates GAN stability from f0
    extraction noise.
    """
    import numpy as np

    from bisinger_tpu.data.synthetic import midi_to_hz, render_notes
    from bisinger_tpu.utils.audio import wav2spec

    sr, hop = hp["audio_sample_rate"], hp["hop_size"]
    # every clip must cover at least one `frames`-frame training window
    # (sample_batch slices windows of exactly that many mel frames)
    min_sec = (frames + 2) * hop / sr
    clips = []
    for i in range(n_clips):
        n_notes = rng.randint(4, 8)
        notes = np.clip(60 + np.cumsum(rng.randint(-3, 4, n_notes)), 50, 75)
        durs = rng.uniform(0.15, 0.4, n_notes)
        if durs.sum() < min_sec:
            durs = durs * (min_sec / durs.sum())
        wav = render_notes(list(notes), list(durs), sr, rng)
        wav_pad, mel = wav2spec(
            wav, sr, hp["fft_size"], hop, hp["win_size"],
            hp["audio_num_mel_bins"], hp["fmin"], hp["fmax"],
        )
        # frame-exact f0 from the note grid
        f0 = np.zeros(mel.shape[0], np.float32)
        pos = 0.0
        for note, dur in zip(notes, durs):
            a, b = int(pos * sr / hop), int((pos + dur) * sr / hop)
            f0[a : min(b, len(f0))] = midi_to_hz(note)
            pos += dur
        clips.append((mel.astype(np.float32), f0, wav_pad.astype(np.float32)))
    return clips


def sample_batch(clips, batch, frames, hop, rng):
    import numpy as np

    mels, f0s, wavs = [], [], []
    for _ in range(batch):
        mel, f0, wav = clips[rng.randint(len(clips))]
        start = rng.randint(max(mel.shape[0] - frames, 1))
        mels.append(mel[start : start + frames])
        f0s.append(f0[start : start + frames])
        wavs.append(wav[start * hop : (start + frames) * hop])
    return {
        "mels": np.stack(mels),
        "f0": np.stack(f0s),
        "wav": np.stack(wavs),
    }


def main():
    platform = os.environ.get("TV_PLATFORM", "cpu")
    steps = int(os.environ.get("TV_STEPS", 400))
    batch = int(os.environ.get("TV_BATCH", 4))
    frames = int(os.environ.get("TV_FRAMES", 32))
    channels = int(os.environ.get("TV_CHANNELS", 64))
    # required fractional gen_mel improvement (0.7 = 30% drop); short
    # smoke runs use a looser bar
    improve = float(os.environ.get("TV_IMPROVE", 0.7))
    # D/G balance window: disc_loss outside (dmin, dmax) at the end means
    # collapse (D won completely) or blow-up. Early in training D winning
    # is NORMAL (the generator is random), so smoke runs set TV_DMIN=0.
    d_min = float(os.environ.get("TV_DMIN", 0.05))
    d_max = float(os.environ.get("TV_DMAX", 8.0))
    out_dir = os.path.abspath(os.environ.get("TV_OUT", "/tmp/bisinger_vocoder"))

    import jax

    if platform:
        jax.config.update("jax_platforms", platform)

    import numpy as np

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.training.vocoder_task import HifiGanTask
    from bisinger_tpu.vocoders.hifigan import HifiGAN, flatten_params

    os.makedirs(out_dir, exist_ok=True)
    overrides = dict(
        use_pitch_embed=True,  # enables the NSF source path
        upsample_initial_channel=channels,
        vocoder_ckpt=os.path.join(out_dir, "vocoder"),
    )
    multiband = int(os.environ.get("TV_MULTIBAND", 1))
    if multiband > 1:
        overrides.update(
            vocoder_multiband=multiband,
            upsample_rates=[8, 4],
            upsample_kernel_sizes=[16, 8],
        )
    hp = load_hparams(overrides=overrides)
    rng_np = np.random.RandomState(0)
    clips = build_windows(hp, n_clips=12, frames=frames, rng=rng_np)
    log(f"{len(clips)} synthetic clips")

    task = HifiGanTask(hp)
    probe = sample_batch(clips, batch, frames, hp["hop_size"], rng_np)
    gen_state, disc_state = task.init_states(
        jax.random.PRNGKey(0), probe["mels"], probe["f0"], probe["wav"]
    )
    # fold weight-norm (g, v) back to plain kernels for the inference
    # wrapper (training/weight_norm.py)
    init_gen_params = task.export_gen_params(gen_state.params)

    rng = jax.random.PRNGKey(1)
    history = []
    t0 = time.time()
    t_first = None
    for step in range(1, steps + 1):
        b = sample_batch(clips, batch, frames, hp["hop_size"], rng_np)
        rng, step_rng = jax.random.split(rng)
        gen_state, disc_state, metrics = task.train_step(
            gen_state, disc_state, b, step_rng
        )
        if step == 1:
            metrics = jax.device_get(metrics)  # sync: exclude compile time
            t_first = time.time()
        if step % max(steps // 20, 1) == 0 or step == 1:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            m["step"] = step
            history.append(m)
            log(f"step {step}: " + " ".join(
                f"{k}={v:.4f}" for k, v in sorted(m.items()) if k != "step"))
            if not all(np.isfinite(v) for v in m.values()):
                log("NaN/Inf detected — aborting")
                print(json.dumps({"ok": False, "history": history}))
                return 1
    steps_per_s = (steps - 1) / max(time.time() - t_first, 1e-9)

    # ---- save + round-trip through the inference wrapper -------------------
    ckpt_dir = hp["vocoder_ckpt"]
    os.makedirs(ckpt_dir, exist_ok=True)
    flat = flatten_params(jax.device_get(task.export_gen_params(gen_state.params)))
    np.savez(os.path.join(ckpt_dir, f"generator_{steps:09d}.npz"), **flat)

    voc = HifiGAN(hp)
    assert voc.loaded, "round-trip failed: wrapper fell back to random init"
    mel, f0, wav_gt = clips[0]
    t_eval = min(mel.shape[0], 128)
    wav_trained = np.asarray(voc.spec2wav(mel[:t_eval], f0[:t_eval]))

    voc_init = HifiGAN(hp, params=init_gen_params)
    wav_init = np.asarray(voc_init.spec2wav(mel[:t_eval], f0[:t_eval]))

    from bisinger_tpu.utils.audio import wav2spec as _w2s

    def mel_l1_of(wav_out):
        n = min(len(wav_out), t_eval * hp["hop_size"])
        _, m = _w2s(np.asarray(wav_out[:n], np.float32), hp["audio_sample_rate"],
                    hp["fft_size"], hp["hop_size"], hp["win_size"],
                    hp["audio_num_mel_bins"], hp["fmin"], hp["fmax"])
        t = min(m.shape[0], t_eval)
        return float(np.abs(m[:t] - mel[:t]).mean())

    mel_l1_trained = mel_l1_of(wav_trained)
    mel_l1_init = mel_l1_of(wav_init)

    from bisinger_tpu.utils.audio import save_wav

    save_wav(wav_trained, os.path.join(out_dir, "vocoded.wav"),
             hp["audio_sample_rate"])

    first, last = history[0], history[-1]
    summary = {
        "steps": steps,
        "steps_per_s": round(steps_per_s, 3),
        "batch": batch,
        "frames": frames,
        "gen_mel_first": first["gen_mel"],
        "gen_mel_last": last["gen_mel"],
        "disc_loss_first": first["disc_loss"],
        "disc_loss_last": last["disc_loss"],
        "mel_l1_vocoded_init": mel_l1_init,
        "mel_l1_vocoded_trained": mel_l1_trained,
        "ok": bool(
            np.isfinite([v for h in history for v in h.values()]).all()
            and last["gen_mel"] < improve * first["gen_mel"]
            and d_min < last["disc_loss"] < d_max
            and mel_l1_trained < mel_l1_init
        ),
    }
    with open(os.path.join(out_dir, "history.json"), "w") as f:
        json.dump(history, f)
    print(json.dumps(summary))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
