"""Stage-share breakdown of the parity synthesis pipeline on one chip.

Times each stage of the headline bench.py graph SEPARATELY (each as its
own jit, synced by host fetch): fs2 conditioner + duration, the
diffusion sampling scan, PE f0 re-estimation, the NSF HiFi-GAN vocoder.
The sum exceeds the fused end-to-end time slightly (extra HBM
round-trips between stages), but the RATIO is the optimization map —
recorded in docs/performance.md.

Env: PS_B (default 32), PS_T (1024), PS_SAMPLER (plms|dpmpp),
PS_PLATFORM=cpu for smoke.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[profile_split] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("PS_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PS_PLATFORM"])
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/bisinger_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    smoke = os.environ.get("PS_PLATFORM") == "cpu"
    B = int(os.environ.get("PS_B", 4 if smoke else 32))
    T_MEL = int(os.environ.get("PS_T", 64 if smoke else 1024))
    T_TOK = 16 if smoke else 128
    VOCAB = 64

    from __graft_entry__ import _batch
    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.models.hifigan import HifiGanGenerator
    from bisinger_tpu.models.pe import PitchExtractor
    from bisinger_tpu.training.tasks import DiffSingerMIDITask

    size = (
        dict(
            hidden_size=32, enc_layers=1, dec_layers=1, num_heads=2,
            residual_layers=2, residual_channels=32, timesteps=8, K_step=8,
            pndm_speedup=2, upsample_initial_channel=32,
        )
        if smoke
        else dict(
            hidden_size=256, enc_layers=4, dec_layers=4,
            residual_layers=20, residual_channels=256,
            dilation_cycle_length=4, timesteps=1000, K_step=1000,
            schedule_type="linear", max_beta=0.02, pndm_speedup=5,
            gaussian_start=True, upsample_initial_channel=512,
            vocoder_time_fold=4,
        )
    )
    hp = load_hparams(
        overrides=dict(
            use_pitch_embed=False, num_spk=21,
            max_frames=T_MEL, bucket_tokens=[T_TOK], bucket_frames=[T_MEL],
            upsample_rates=[8, 4, 2, 2], upsample_kernel_sizes=[16, 8, 4, 4],
            diff_sampler=os.environ.get("PS_SAMPLER", "plms"),
            **size,
        )
    )
    batch = _batch(B, T_TOK, T_MEL, VOCAB)
    task = DiffSingerMIDITask(hp, VOCAB)
    rng = jax.random.PRNGKey(0)
    state = task.init_state(rng, batch)
    params = state.params
    model = task.model

    # ---- stage jits -----------------------------------------------------
    kw = dict(
        infer=True,
    )

    def call_model(params, batch, rng, **extra):
        return model.apply(
            {"params": params},
            txt_tokens=batch["txt_tokens"],
            mel2ph=batch["mel2ph"],
            spk_embed=batch["spk_ids"],
            pitch_midi=batch["pitch_midi"],
            midi_dur=batch["midi_dur"],
            is_slur=batch["is_slur"],
            lang=batch["lang"],
            speechsing=batch["speechsing"],
            rng=rng,
            rngs={"diffusion": rng},
            **extra,
        )

    @jax.jit
    def full(params, batch, rng):
        ret = call_model(params, batch, rng, **kw)
        return jnp.abs(ret["mel_out"]).mean(), ret["mel_out"]

    # conditioner only: skip the sampling scan via infer=False +
    # teacher-forced mels (the fs2/encoder/duration share)
    @jax.jit
    def cond_only(params, batch, rng):
        ret = call_model(params, batch, rng, infer=False, ref_mels=batch["mels"])
        return jnp.abs(ret["decoder_inp"]).mean()

    pe = PitchExtractor(hp=hp)
    mel0 = np.zeros((B, T_MEL, 80), np.float32)
    pe_vars = pe.init({"params": jax.random.PRNGKey(3)}, mel0)

    @jax.jit
    def pe_only(pe_vars, mel):
        return jnp.abs(pe.apply(pe_vars, mel)["f0_denorm_pred"]).mean()

    voc = HifiGanGenerator(hp=hp)
    f00 = np.full((B, T_MEL), 220.0, np.float32)
    voc_params = voc.init(
        {"params": jax.random.PRNGKey(1), "nsf": jax.random.PRNGKey(2)},
        mel0, f00,
    )["params"]

    @jax.jit
    def voc_only(voc_params, mel, f0, rng):
        return jnp.abs(
            voc.apply({"params": voc_params}, mel, f0, rngs={"nsf": rng})
        ).mean()

    def timeit(name, fn, *args, n=3):
        t0 = time.perf_counter()
        float(fn(*args)[0] if name == "full_pipeline" else fn(*args))
        log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(n):
            float(fn(*args)[0] if name == "full_pipeline" else fn(*args))
        dt = (time.perf_counter() - t0) / n
        return dt

    t_full = timeit("full_pipeline", full, params, batch, rng)
    _, mel = full(params, batch, rng)
    mel = jax.device_get(mel)
    t_cond = timeit("fs2_conditioner", cond_only, params, batch, rng)
    t_pe = timeit("pe", pe_only, pe_vars, jnp.asarray(mel))
    t_voc = timeit(
        "vocoder_nsf", voc_only, voc_params, jnp.asarray(mel),
        jnp.asarray(f00), rng,
    )
    t_diff = max(t_full - t_cond, 0.0)  # sampling scan ≈ full minus cond

    audio_s = B * T_MEL * hp["hop_size"] / hp["audio_sample_rate"]
    rows = {
        "full_mel_pipeline_ms": t_full * 1000,
        "fs2_conditioner_ms": t_cond * 1000,
        "diffusion_scan_ms_est": t_diff * 1000,
        "pe_ms": t_pe * 1000,
        "vocoder_nsf_ms": t_voc * 1000,
        "e2e_ms_sum": (t_full + t_pe + t_voc) * 1000,
        "audio_s_per_s_staged": audio_s / (t_full + t_pe + t_voc),
    }
    print(
        json.dumps(
            {
                "metric": "stage_split",
                "B": B,
                "T": T_MEL,
                "sampler": hp["diff_sampler"],
                **{k: round(v, 2) for k, v in rows.items()},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
