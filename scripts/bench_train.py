"""Training-step throughput at production scale on one chip.

The reference's training budgets are 320k steps for the FFT-Singer
stage and up to 900k for the diffusion stage on one GPU
(`/root/reference/doc/train.md:10`, `usr/configs/*/diff.yaml:20`); it
publishes no steps/s. This measures both stages' jitted train_step at
the production model size (hidden 256 / 20 residual layers, B x T_mel
= 24 x 1024 tokens-bucketed batch) and reports steps/s plus the
wall-clock days each reference budget would take on one chip.

Run: python scripts/bench_train.py          (real chip)
     BT_PLATFORM=cpu python scripts/bench_train.py  (host smoke)
Env: BT_B (24), BT_T (1024), BT_STEPS (20).
     BT_MFU=1 adds FLOP accounting per step (XLA cost analysis on the
     compiled executable) and reports achieved TFLOP/s + MFU against
     BT_PEAK_TFLOPS (default 197, the v5e bf16 MXU peak; fp32 paths
     count against the same number, so fp32-heavy steps understate).
     BT_VOC=1 also measures the HifiGanTask adversarial step (D+G
     update, B=BT_VOC_B x BT_VOC_FRAMES windows, 512-channel NSF
     generator — the train_vocoder.py production shape).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[bench_train] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    if os.environ.get("BT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BT_PLATFORM"])
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/bisinger_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.training.tasks import AuxDecoderMIDITask, DiffSingerMIDITask

    B = int(os.environ.get("BT_B", 24))
    T_MEL = int(os.environ.get("BT_T", 1024))
    T_TOKENS = 128
    VOCAB = 64
    n_steps = int(os.environ.get("BT_STEPS", 20))

    hp = load_hparams(
        overrides=dict(
            hidden_size=256,
            enc_layers=4,
            dec_layers=4,
            residual_layers=20,
            residual_channels=256,
            dilation_cycle_length=4,
            timesteps=1000,
            K_step=1000,
            schedule_type="linear",
            max_beta=0.02,
            gaussian_start=True,
            use_pitch_embed=False,
            num_spk=21,
            max_frames=T_MEL,
            bucket_tokens=[T_TOKENS],
            bucket_frames=[T_MEL],
        )
    )

    from __graft_entry__ import _batch

    batch = _batch(B, T_TOKENS, T_MEL, VOCAB, seed=0)
    # device-resident batch: the production trainer feeds from a
    # device-resident corpus (data/device_corpus.py), so the honest
    # step time excludes the per-step H2D upload (which dominated on
    # the tunnel platform: fs2 went 4.5 -> 22.6 steps/s when the
    # trainer switched). BT_STREAMING=1 restores the old measurement.
    if os.environ.get("BT_STREAMING") != "1":
        batch = jax.device_put(batch)
    rng = jax.random.PRNGKey(0)

    mfu = os.environ.get("BT_MFU") == "1"
    peak_tflops = float(os.environ.get("BT_PEAK_TFLOPS", 197.0))

    def step_flops(jitted, *args):
        """Per-step FLOPs from XLA's cost analysis of the compiled
        executable (counts the whole fwd+bwd+optimizer program)."""
        try:
            ca = jitted.lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca["flops"])
        except Exception as e:  # pragma: no cover - cost analysis is per-backend
            log(f"cost analysis unavailable: {e}")
            return None

    out = {"metric": "train_steps_per_second", "unit": f"steps/s (B={B}, T={T_MEL})"}
    budgets = {"fs2": 320_000, "diff": 900_000}
    for name, task_cls in (
        ("fs2", AuxDecoderMIDITask),
        ("diff", DiffSingerMIDITask),
    ):
        task = task_cls(hp, VOCAB)
        state = task.init_state(rng, batch)
        log(f"{name}: compiling...")
        t0 = time.perf_counter()
        state, losses = task.train_step(state, batch, rng)
        # host fetch = hard sync (block_until_ready returns early on the
        # axon tunnel platform)
        float(next(iter(losses.values())))
        log(f"{name}: warmup {time.perf_counter() - t0:.1f}s")
        # measure the way the trainer actually runs (trainer.py:_fit_loop):
        # steps are dispatched back-to-back and losses are fetched once
        # per log window, NOT per step — a per-step fetch would add a
        # full tunnel round-trip to every step (measured 2x on the
        # diffusion step: 427 -> 198 ms/step, 2026-08-19). Two windows;
        # keep the best (tunnel noise is one-sided).
        dts = []
        for _ in range(2):
            t0 = time.perf_counter()
            for i in range(n_steps):
                state, losses = task.train_step(
                    state, batch, jax.random.fold_in(rng, i)
                )
            float(next(iter(losses.values())))  # one sync per window
            dts.append((time.perf_counter() - t0) / n_steps)
        dt = min(dts)
        out[name] = {
            "steps_per_s": round(1 / dt, 3),
            "ms_per_step": round(dt * 1000, 2),
            "days_to_reference_budget": round(budgets[name] * dt / 86400, 2),
            "frames_per_s": round(B * T_MEL / dt),
        }
        if mfu:
            fl = step_flops(
                type(task).train_step, task, state, batch, jax.random.fold_in(rng, 0)
            )
            if fl is not None:
                out[name].update(
                    tflop_per_step=round(fl / 1e12, 3),
                    achieved_tflops=round(fl / 1e12 / dt, 2),
                    mfu_pct=round(100 * fl / 1e12 / dt / peak_tflops, 2),
                )
        log(f"{name}: {1/dt:.2f} steps/s ({dt*1000:.0f} ms/step) {out[name]}")

    if os.environ.get("BT_VOC") == "1":
        import numpy as np

        from bisinger_tpu.training.vocoder_task import HifiGanTask

        vb = int(os.environ.get("BT_VOC_B", 8))
        frames = int(os.environ.get("BT_VOC_FRAMES", 64))
        hop = hp["hop_size"]
        vhp = hp.replace(
            upsample_rates=[8, 4, 2, 2],
            upsample_kernel_sizes=[16, 8, 4, 4],
            upsample_initial_channel=512,
            use_nsf=True,
        )
        vtask = HifiGanTask(vhp)
        r = np.random.default_rng(0)
        vbatch = {
            "mels": r.normal(-2, 1.5, (vb, frames, 80)).astype(np.float32),
            "f0": np.full((vb, frames), 220.0, np.float32),
            "wav": (0.1 * r.normal(size=(vb, frames * hop))).astype(np.float32),
        }
        gs, ds = vtask.init_states(
            rng, vbatch["mels"], vbatch["f0"], vbatch["wav"]
        )
        log("voc_gan: compiling...")
        gs, ds, m = vtask.train_step(gs, ds, vbatch, rng)
        float(m["gen_loss"])
        dts = []
        for _ in range(2):
            t0 = time.perf_counter()
            for i in range(n_steps):
                gs, ds, m = vtask.train_step(
                    gs, ds, vbatch, jax.random.fold_in(rng, i)
                )
            float(m["gen_loss"])
            dts.append((time.perf_counter() - t0) / n_steps)
        dt = min(dts)
        out["voc_gan"] = {
            "steps_per_s": round(1 / dt, 3),
            "ms_per_step": round(dt * 1000, 2),
            "audio_s_per_step": round(vb * frames * hop / vhp["audio_sample_rate"], 3),
        }
        if mfu:
            gs2, ds2 = vtask.init_states(
                jax.random.fold_in(rng, 99), vbatch["mels"], vbatch["f0"], vbatch["wav"]
            )
            fl = step_flops(
                type(vtask).train_step, vtask, gs2, ds2, vbatch, rng
            )
            if fl is not None:
                out["voc_gan"].update(
                    tflop_per_step=round(fl / 1e12, 3),
                    achieved_tflops=round(fl / 1e12 / dt, 2),
                    mfu_pct=round(100 * fl / 1e12 / dt / peak_tflops, 2),
                )
        log(f"voc_gan: {1/dt:.2f} steps/s {out['voc_gan']}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
