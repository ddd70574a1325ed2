"""Input-pipeline overlap: synchronous vs background-prefetch feeding.

`Trainer.fit` feeds collated batches through a depth-2 daemon-thread
`Prefetcher` (`data/prefetch.py`) that runs record fetch + collate +
`device_put` ahead of the device step — the Grain/tf.data-style async
feeding SURVEY §7.1 commits to (the reference leans on torch DataLoader
worker processes, `tasks/base_task.py` loaders). This measures the real
end-to-end `Trainer.fit` loop — the actual DataLoader (bucket batching,
padding, collate) over a binarized synthetic corpus, not pre-staged
arrays — with `dataloader_prefetch` 0 (sync) vs 2 (async) and reports
steps/s for both plus the uplift.

Run:  python scripts/bench_pipeline.py           (real chip)
      BP_PLATFORM=cpu python scripts/bench_pipeline.py  (host smoke)
Env:  BP_STEPS (60)  BP_ITEMS (96)  BP_HIDDEN (256)  BP_OUT (dir)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[bench_pipeline] {msg}", file=sys.stderr, flush=True)


def main():
    platform = os.environ.get("BP_PLATFORM", "")
    steps = int(os.environ.get("BP_STEPS", 60))
    n_items = int(os.environ.get("BP_ITEMS", 96))
    hidden = int(os.environ.get("BP_HIDDEN", 256))
    out_dir = os.path.abspath(os.environ.get("BP_OUT", "/tmp/bisinger_pipebench"))

    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/bisinger_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.data.binarizer import M4SingerBinarizer
    from bisinger_tpu.data.synthetic import make_synthetic_corpus
    from bisinger_tpu.training.tasks import AuxDecoderMIDITask
    from bisinger_tpu.training.trainer import Trainer
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
        # production-width fs2 so the device step is the real workload
        hidden_size=hidden,
        enc_layers=4,
        dec_layers=4,
        use_pitch_embed=True,
        bucket_tokens=[16],
        bucket_frames=[768],
        max_tokens=12000,
        max_sentences=16,
        max_words=32,
        max_updates=steps,
        log_interval=10_000,  # logging off: measure the bare loop
        val_check_interval=10_000_000,
        num_sanity_val_steps=0,
        num_ckpt_keep=0,
        save_ckpt=False,
        warmup_updates=50,
        lr=1.0,
        clip_grad_norm=1.0,
        save_codes=False,
    )
    hp0 = load_hparams(overrides=dict(base, work_dir=os.path.join(out_dir, "w0")))
    if not os.path.exists(os.path.join(hp0["binary_data_dir"], "phone_set.json")):
        M4SingerBinarizer(hp0).process()
        log("binarized")
    vocab = build_phone_encoder(hp0["binary_data_dir"]).vocab_size

    results = {}
    variants = (
        (0, "main", "sync"),
        (2, "main", "prefetch2"),  # H2D on the consumer thread
        (2, "worker", "prefetch2_worker"),  # full overlap incl. H2D
    )
    for depth, put, label in variants:
        hp = load_hparams(
            overrides=dict(
                base,
                work_dir=os.path.join(out_dir, f"w_{label}"),
                dataloader_prefetch=depth,
                dataloader_prefetch_put=put,
            )
        )
        task = AuxDecoderMIDITask(hp, vocab)
        tr = Trainer(task, hp)
        # warmup fit: pays compile; then the timed fit reuses the jit cache
        jax.device_get(tr.fit(max_updates=3).step)
        t0 = time.time()
        state = tr.fit(max_updates=steps)
        # hard sync: fit returns once the last step is DISPATCHED; fetch
        # a scalar so queued device work is inside the timed window
        jax.device_get(state.step)
        dt = time.time() - t0
        sps = (steps - 3) / dt
        results[label] = sps
        log(f"{label}: {steps - 3} steps in {dt:.2f}s -> {sps:.3f} steps/s")

    uplift = results["prefetch2"] / results["sync"] - 1.0
    uplift_w = results["prefetch2_worker"] / results["sync"] - 1.0
    print(
        json.dumps(
            {
                "metric": "train_pipeline_steps_per_second",
                "value": round(results["prefetch2"], 3),
                "unit": f"steps/s (fs2 fit loop, prefetch depth 2, H2D on "
                f"consumer; sync={results['sync']:.3f} "
                f"uplift={uplift * 100:+.1f}%; worker-H2D variant="
                f"{results['prefetch2_worker']:.3f} {uplift_w * 100:+.1f}%)",
                "vs_baseline": round(uplift, 4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
