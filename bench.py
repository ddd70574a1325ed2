"""Benchmark: end-to-end singing synthesis throughput on one chip.

Measures the BASELINE.md north-star — audio-seconds generated per second
per chip for the full mel+vocoder path:

  score-like batch -> FastSpeech2MIDI conditioner -> shallow-diffusion
  PLMS sampling (K=1000, speedup 5 -> 200 NFE, the BiSinger production
  config `usr/configs/m4-detect-ori-shift/diff.yaml:16-23`) -> PE f0
  re-estimation (production `pe_enable: true`, `diff.yaml:33`) ->
  HiFi-GAN NSF vocoder -> waveform. BENCH_PE=0 drops the PE stage;
  BENCH_B / BENCH_T sweep batch and frame count.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.json
`published: {}`), so vs_baseline is the real-time factor (value / 1.0):
how many seconds of audio are synthesized per wall-clock second.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    # BENCH_PLATFORM=cpu forces the host backend for smoke tests (the
    # env var JAX_PLATFORMS alone is overridden by the site backend
    # registration in this container)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    # persistent compile cache: first run pays the (slow, tunneled) TPU
    # compile; later runs start in seconds
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/bisinger_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.training.tasks import DiffSingerMIDITask
    from bisinger_tpu.models.hifigan import HifiGanGenerator
    from bisinger_tpu.models.pe import PitchExtractor

    # production-scale config (reference m4-detect-ori-shift); batch is
    # overridable for throughput sweeps
    # B=32 is the measured single-chip throughput sweet spot
    # (B=24: 142.7, B=32: 151.4, B=48: 138.4 audio-s/s — BASELINE.md)
    B = int(os.environ.get("BENCH_B", 32))
    T_TOKENS = 128
    T_MEL = int(os.environ.get("BENCH_T", 1024))  # ~5.46 s at 24 kHz / hop 128
    VOCAB = 64
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
            pndm_speedup=5,
            gaussian_start=True,
            use_pitch_embed=False,
            num_spk=21,
            max_frames=T_MEL,
            bucket_tokens=[T_TOKENS],
            bucket_frames=[T_MEL],
            # hop 128 vocoder
            upsample_rates=[8, 4, 2, 2],
            upsample_kernel_sizes=[16, 8, 4, 4],
            upsample_initial_channel=512,
            # XLA is the measured winner at the throughput batch (B=24,
            # T=1024: XLA 834 ms vs batch-tiled pallas 1179 ms,
            # scripts/probe_diffusion.py); the fused pallas kernel is the
            # LATENCY mode — it wins +19% at B<=4. Set
            # BENCH_DIFFNET_BACKEND=pallas BENCH_B=4 to measure it.
            diffnet_backend=os.environ.get("BENCH_DIFFNET_BACKEND", "xla"),
            # PLMS 200-NFE is the reference-parity default; set
            # BENCH_SAMPLER=dpmpp for the fast ODE sampler
            diff_sampler=os.environ.get("BENCH_SAMPLER", "plms"),
            dpm_steps=int(os.environ.get("BENCH_DPM_STEPS", 40)),
            # exact time-folded MRF stages (see ops/time_fold.py)
            vocoder_time_fold=int(os.environ.get("BENCH_VOC_FOLD", 4)),
            # BENCH_MRF=pallas runs the EXPERIMENTAL fused MRF kernel
            # (ops/mrf_pallas.py) — measured slower than XLA on v5e;
            # see the STATUS note there. Off by default.
            vocoder_mrf_backend=os.environ.get("BENCH_MRF", ""),
            # BENCH_SUBPIXEL=1: phase-packed dense lowering for the
            # upsample transpose convs (ops/subpixel.py, exact rewrite)
            vocoder_subpixel=bool(int(os.environ.get("BENCH_SUBPIXEL", 0))),
        )
    )
    # BENCH_MULTIBAND=4: PQMF fast mode — the generator emits 4 subbands
    # at sr/4 (tail MRF stages run 4x shorter) and PQMF synthesizes the
    # full-rate wav. Trained-mode variant: throughput-valid here (bench
    # weights are random either way), quality needs multiband training.
    multiband = int(os.environ.get("BENCH_MULTIBAND", 1))
    if multiband > 1:
        # contract: prod(upsample_rates) * n_bands == hop_size (128)
        mb_rates = {2: [8, 4, 2], 4: [8, 4], 8: [4, 4], 16: [8]}[multiband]
        hp = hp.replace(
            vocoder_multiband=multiband,
            upsample_rates=mb_rates,
            upsample_kernel_sizes=[2 * r for r in mb_rates],
            # time_fold targets narrow FULL-RATE tail stages; with <=2
            # upsample stages the tail channels stay >=128 already
            vocoder_time_fold=int(os.environ.get("BENCH_VOC_FOLD", 0)),
        )

    # BENCH_CKPT=<dir>: run the bench on TRAINED flagship weights
    # (scripts/train_flagship.py exports: diff_params.npz with the full
    # fs2+DiffNet tree, pe_params.npz + pe_batch_stats.npz, and the
    # vocoder/voc_mb4 generator npz from the GAN stage) instead of
    # random init. Throughput is weight-independent on this stack
    # (static shapes, no data-dependent control flow), so this mode
    # exists to PIN that claim and to make the bench output a real
    # singing-voice synthesis. DEFAULT: artifacts/flagship when its
    # export exists (so the recorded bench measures trained weights);
    # BENCH_CKPT=0 forces random init.
    _default_ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "artifacts", "flagship")
    ckpt_dir = os.environ.get(
        "BENCH_CKPT",
        _default_ckpt
        if os.path.exists(os.path.join(_default_ckpt, "diff_params.npz"))
        else "",
    )
    if ckpt_dir in ("0", "none"):
        ckpt_dir = ""
    ckpt_tag = ""
    if ckpt_dir:
        try:
            from bisinger_tpu.vocoders.hifigan import unflatten_params

            def _load_npz(name):
                return unflatten_params(
                    dict(np.load(os.path.join(ckpt_dir, name), allow_pickle=False))
                )

            trained_params = _load_npz("diff_params.npz")
            # the trained token-embedding row count is the corpus vocab
            VOCAB = int(
                trained_params["fs2"]["token_embed"]["embed"]["embedding"].shape[0]
            )
            with open(os.path.join(ckpt_dir, "hparams_diff.json")) as f:
                fhp = json.load(f)
            # model-shape keys must come from the trained run; bench knobs
            # (sampler, backend, buckets) stay env-controlled
            hp = hp.replace(
                **{
                    k: fhp[k]
                    for k in (
                        "hidden_size", "enc_layers", "dec_layers", "num_spk",
                        "enc_ffn_kernel_size", "dec_ffn_kernel_size",
                        "residual_layers", "residual_channels",
                        "dilation_cycle_length", "timesteps", "K_step",
                        "schedule_type", "max_beta", "spec_min", "spec_max",
                        "use_pitch_embed", "use_spk_id", "use_spk_embed",
                        "predictor_hidden", "predictor_layers", "dur_predictor_layers",
                    )
                    if k in fhp
                }
            )
            ckpt_tag = ", trained flagship weights"
            log(f"loaded trained acoustic params from {ckpt_dir} (vocab {VOCAB})")
        except Exception as e:
            log(f"WARNING: trained-checkpoint load failed ({e}); random init")
            ckpt_dir = ""

    from __graft_entry__ import _batch

    batch = _batch(B, T_TOKENS, T_MEL, VOCAB, seed=0)

    task = DiffSingerMIDITask(hp, VOCAB)
    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, batch)
    params = state.params
    if ckpt_dir:
        try:
            params = jax.tree_util.tree_map(
                lambda a, b: jax.numpy.asarray(b, a.dtype), params, trained_params
            )
        except Exception as e:
            log(f"WARNING: trained param tree mismatch ({e}); random init")
            ckpt_dir, ckpt_tag = "", ""

    voc = HifiGanGenerator(hp=hp)
    mel0 = np.zeros((B, T_MEL, 80), np.float32)
    f00 = np.full((B, T_MEL), 220.0, np.float32)
    voc_params = voc.init(
        {"params": jax.random.PRNGKey(1), "nsf": jax.random.PRNGKey(2)},
        mel0,
        f00,
    )["params"]
    if ckpt_dir:
        import glob as _g

        sub = "vocoder_mb4" if multiband == 4 else "vocoder"
        cands = sorted(
            _g.glob(os.path.join(ckpt_dir, sub, "**", "generator_*.npz"), recursive=True)
        )
        if cands:
            from bisinger_tpu.vocoders.hifigan import unflatten_params as _unf

            voc_params = _unf(dict(np.load(cands[-1], allow_pickle=False)))
            log(f"loaded trained vocoder params: {cands[-1]}")
        else:
            log(f"WARNING: no trained vocoder npz under {ckpt_dir}/{sub}; random init")

    # PE f0 re-estimation between diffusion and the vocoder — the
    # production path (pe_enable). eval-mode apply uses batch_stats.
    use_pe = os.environ.get("BENCH_PE", "1") == "1"
    pe = PitchExtractor(hp=hp) if use_pe else None
    pe_vars = (
        pe.init({"params": jax.random.PRNGKey(3)}, mel0) if use_pe else None
    )
    if ckpt_dir and use_pe:
        pe_vars = {"params": _load_npz("pe_params.npz")}
        stats_fn = os.path.join(ckpt_dir, "pe_batch_stats.npz")
        if os.path.exists(stats_fn):
            pe_vars["batch_stats"] = _load_npz("pe_batch_stats.npz")
        else:
            log("WARNING: pe_batch_stats.npz missing; PE BatchNorm uses init stats")
        log("loaded trained PE params")

    @jax.jit
    def synth(params, voc_params, pe_vars, batch, rng):
        ret = task.model.apply(
            {"params": params},
            txt_tokens=batch["txt_tokens"],
            mel2ph=batch["mel2ph"],
            spk_embed=batch["spk_ids"],
            pitch_midi=batch["pitch_midi"],
            midi_dur=batch["midi_dur"],
            is_slur=batch["is_slur"],
            lang=batch["lang"],
            speechsing=batch["speechsing"],
            infer=True,
            rng=rng,
            rngs={"diffusion": rng},
        )
        mel = ret["mel_out"]
        if use_pe:
            f0 = pe.apply(pe_vars, mel)["f0_denorm_pred"]
        else:
            f0 = jax.numpy.full((mel.shape[0], mel.shape[1]), 220.0)
        wav = voc.apply(
            {"params": voc_params}, mel, f0, rngs={"nsf": jax.random.fold_in(rng, 1)}
        )
        if multiband > 1:
            from bisinger_tpu.models.pwg import pqmf_from_hparams

            wav = pqmf_from_hparams(hp).synthesis(wav)
        # return a scalar: fetching it to host forces real completion
        # (block_until_ready returns early on the axon tunnel platform)
        import jax.numpy as jnp

        return jnp.abs(wav).mean()

    # warmup / compile (host fetch = hard sync)
    log("compiling + warmup...")
    t0 = time.perf_counter()
    float(synth(params, voc_params, pe_vars, batch, rng))
    log(f"warmup done in {time.perf_counter() - t0:.1f}s")

    # timed runs, synced by host fetch each call
    n_runs = 3
    t0 = time.perf_counter()
    for i in range(n_runs):
        float(synth(params, voc_params, pe_vars, batch, jax.random.fold_in(rng, i)))
        log(f"run {i}: cumulative {time.perf_counter() - t0:.2f}s")
    dt = (time.perf_counter() - t0) / n_runs

    audio_seconds = B * T_MEL * hp["hop_size"] / hp["audio_sample_rate"]
    value = audio_seconds / dt
    if hp["diff_sampler"] == "dpmpp":
        sampler_desc = f"{hp['dpm_steps']}-NFE DPM-Solver++"
    else:
        sampler_desc = f"{hp['K_step'] // hp['pndm_speedup']}-NFE PLMS"
    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_second_per_chip",
                "value": round(value, 3),
                "unit": (
                    f"audio-s/s (B={B}, {sampler_desc} diffusion"
                    + (" + PE f0" if use_pe else "")
                    + " + HiFi-GAN NSF"
                    + (f" MB{multiband}-PQMF" if multiband > 1 else "")
                    + ckpt_tag
                    + ")"
                ),
                "vs_baseline": round(value / 1.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
