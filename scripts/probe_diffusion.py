"""Diffusion-stage A/B probe: XLA vs tiled-Pallas DiffNet at bench shapes.

Times ONLY the score->mel path (fs2 conditioner + PLMS diffusion scan,
no vocoder) for each backend config listed in PROBE_CONFIGS. Used to
decide the `diffnet_backend` default at the bench batch (VERDICT #6).

Run on the real chip:  python scripts/probe_diffusion.py
Env: PROBE_B (24), PROBE_T (1024), PROBE_RUNS (3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[probe] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/bisinger_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.training.tasks import DiffSingerMIDITask
    from __graft_entry__ import _batch

    B = int(os.environ.get("PROBE_B", 24))
    T_TOKENS = 128
    T_MEL = int(os.environ.get("PROBE_T", 1024))
    VOCAB = 64
    n_runs = int(os.environ.get("PROBE_RUNS", 3))

    configs = [
        ("xla", dict(diffnet_backend="xla")),
        ("pallas_b12", dict(diffnet_backend="pallas", pallas_b_chunk=12)),
        ("pallas_b8", dict(diffnet_backend="pallas", pallas_b_chunk=8)),
        ("pallas_b4", dict(diffnet_backend="pallas", pallas_b_chunk=4)),
    ]

    batch = _batch(B, T_TOKENS, T_MEL, VOCAB, seed=0)
    results = {}
    for name, over in configs:
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
                **over,
            )
        )
        task = DiffSingerMIDITask(hp, VOCAB)
        rng = jax.random.PRNGKey(0)
        state = task.init_state(rng, batch)
        params = state.params

        @jax.jit
        def score_to_mel(params, batch, rng):
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
            return jax.numpy.abs(ret["mel_out"]).mean()

        log(f"{name}: compiling...")
        t0 = time.perf_counter()
        float(score_to_mel(params, batch, rng))
        log(f"{name}: warmup {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for i in range(n_runs):
            float(score_to_mel(params, batch, jax.random.fold_in(rng, i)))
        dt = (time.perf_counter() - t0) / n_runs
        results[name] = round(dt * 1000, 1)
        log(f"{name}: {dt * 1000:.1f} ms/batch")

    print(json.dumps({"B": B, "T": T_MEL, "ms_per_batch": results}))


if __name__ == "__main__":
    main()
