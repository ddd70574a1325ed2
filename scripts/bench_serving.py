"""Serving benchmark: concurrent score->wav requests through the HTTP
endpoint + micro-batcher on one chip.

Measures what bench.py (offline throughput) cannot: request LATENCY
under concurrent load, micro-batching efficiency (mean device-program
batch size), and serving throughput. The reference has no serving story
beyond a single-request gradio app (`inference/m4singer/gradio/infer.py`),
so these are self-baselines.

Production-scale model (bench.py dims: hidden 256, 20x256 DiffNet,
K=1000 PLMS speedup 5 -> 200 NFE, NSF HiFi-GAN) with random weights —
throughput/latency-valid, quality-meaningless. Batch-axis bucketing
(hp.bucket_batch_sizes) keeps the number of compiled programs fixed no
matter how group sizes vary; warmup pre-compiles each bucket.

Env knobs:
  SB_PLATFORM=cpu      host-backend smoke run (tiny model)
  SB_N=48              total requests
  SB_CONC=16           concurrent client threads
  SB_MAX_BATCH=8       micro-batcher max group (0/1 = serial lock path)
  SB_WINDOW_MS=25      batching window
  SB_COMPARE=1         also run the serial (max_batch=1) baseline
  SB_SAMPLER=plms      diffusion sampler (dpmpp = 40-NFE latency mode:
                       5x fewer sequential denoise steps — the dominant
                       per-request cost at serving shapes)

Prints one JSON line per metric; records go to BASELINE.md.
"""

import json
import os
import queue
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[bench_serving] {msg}", file=sys.stderr, flush=True)


SCORES = [
    {
        "text": "SP wo xi huan ni circle SP",
        "notes": "rest | C4 | D4 | E4 | F4 | G4 A4 | rest",
        "notes_duration": "0.1 | 0.3 | 0.3 | 0.3 | 0.3 | 0.2 0.2 | 0.1",
    },
    {
        "text": "AP ni hao shi jie hello world AP",
        "notes": "rest | C4 | D4 | E4 | F4 | G4 | A4 G4 | rest",
        "notes_duration": "0.1 | 0.25 | 0.25 | 0.3 | 0.3 | 0.4 | 0.3 0.2 | 0.1",
    },
    {
        "text": "SP la la la la SP",
        "notes": "rest | C4 | E4 | G4 | C5 | rest",
        "notes_duration": "0.1 | 0.4 | 0.4 | 0.4 | 0.6 | 0.1",
    },
]


def build_infer(tmp, smoke: bool):
    import jax
    import numpy as np

    from __graft_entry__ import _batch
    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.data.binarizer import M4SingerBinarizer
    from bisinger_tpu.data.synthetic import make_synthetic_corpus
    from bisinger_tpu.inference.pipeline import SVSInfer
    from bisinger_tpu.training.checkpoints import CheckpointManager
    from bisinger_tpu.training.tasks import DiffSingerMIDITask
    from bisinger_tpu.utils.text_encoder import build_phone_encoder
    from bisinger_tpu.vocoders.hifigan import HifiGAN

    raw = os.path.join(tmp, "raw")
    make_synthetic_corpus(raw, n_items=6, seed=0)
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
            diff_sampler=os.environ.get("SB_SAMPLER", "plms"),
        )
    )
    hp = load_hparams(
        overrides=dict(
            raw_data_dir=raw,
            raw_json_fn="meta.json",
            binary_data_dir=os.path.join(tmp, "bin"),
            dur_predictor_layers=2, predictor_layers=2,
            use_pitch_embed=False, num_spk=4, max_words=16,
            bucket_tokens=[64], bucket_frames=[512],
            upsample_rates=[8, 4, 2, 2],
            upsample_kernel_sizes=[16, 8, 4, 4],
            vocoder_ckpt=os.path.join(tmp, "voc"),
            test_num=1,
            **size,
        )
    )
    M4SingerBinarizer(hp).process()
    encoder = build_phone_encoder(hp["binary_data_dir"])
    task = DiffSingerMIDITask(hp, encoder.vocab_size)
    state = task.init_state(
        jax.random.PRNGKey(0), _batch(1, 64, 512, encoder.vocab_size)
    )
    work = os.path.join(tmp, "work")
    CheckpointManager(os.path.join(work, "ckpt")).save(1, jax.device_get(state))
    HifiGAN(hp).save_params(0)
    vocoder = HifiGAN(hp)
    assert vocoder.loaded
    return SVSInfer.from_work_dir(hp, work, vocoder=vocoder), hp


def run_load(port: int, n: int, conc: int):
    """Fire n requests from conc client threads; return latencies + wav
    audio-seconds."""
    work_q = queue.Queue()
    for i in range(n):
        work_q.put(SCORES[i % len(SCORES)])
    results = []
    res_lock = threading.Lock()

    def client():
        while True:
            try:
                score = work_q.get_nowait()
            except queue.Empty:
                return
            body = json.dumps(score).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/synthesize",
                data=body,
                headers={"Content-Type": "application/json"},
            )
            # intended audio length from the score itself: with random
            # bench weights the duration predictor emits near-zero
            # durations, so the returned (trimmed) wav length would
            # undercount what a trained model synthesizes per request
            score_s = sum(
                float(d)
                for grp in score["notes_duration"].split("|")
                for d in grp.split()
            )
            t0 = time.perf_counter()
            with urllib.request.urlopen(req, timeout=600) as r:
                r.read()
                assert r.status == 200, r.status
            dt = time.perf_counter() - t0
            with res_lock:
                results.append((dt, score_s))

    threads = [threading.Thread(target=client) for _ in range(conc)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return results, wall


def emit(metric, value, unit, extra=None):
    row = {
        "metric": metric,
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(value, 3),
    }
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)


def bench_mode(infer, hp, max_batch: int, n: int, conc: int, window_ms: float):
    import numpy as np

    from bisinger_tpu.inference.server import serve

    httpd = serve(
        infer, host="127.0.0.1", port=0,
        max_batch=max_batch, batch_window_ms=window_ms,
    )
    port = httpd.server_address[1]
    try:
        # warmup: compile every batch bucket the load can hit
        buckets = [
            b
            for b in (hp.get("bucket_batch_sizes") or [1])
            if b <= max(max_batch, 1)
        ] or [1]
        for b in buckets:
            t0 = time.perf_counter()
            infer.infer_batch([SCORES[i % len(SCORES)] for i in range(b)])
            log(f"warmup bucket B={b}: {time.perf_counter() - t0:.1f}s")
        results, wall = run_load(port, n, conc)
    finally:
        httpd.shutdown()
    lats = sorted(dt for dt, _ in results)
    audio_s = sum(s for _, s in results)  # score-intended seconds
    mode = f"mb{max_batch}" if max_batch > 1 else "serial"
    from bisinger_tpu.inference.server import SVSRequestHandler

    sizes = getattr(SVSRequestHandler.batcher, "batch_sizes", [])
    emit(
        f"serving_p50_latency_{mode}",
        lats[len(lats) // 2] * 1000,
        "ms (score->wav, concurrent load)",
    )
    emit(
        f"serving_p95_latency_{mode}",
        lats[int(len(lats) * 0.95)] * 1000,
        "ms",
    )
    emit(
        f"serving_throughput_{mode}",
        audio_s / wall,
        f"scored-audio-s/s ({len(results)} reqs, conc={conc})",
        extra={
            "requests_per_s": round(len(results) / wall, 3),
            **({"mean_batch": round(float(np.mean(sizes)), 2)} if sizes else {}),
        },
    )
    return lats, audio_s / wall


def main():
    import jax

    if os.environ.get("SB_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SB_PLATFORM"])
    smoke = jax.default_backend() == "cpu"
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/bisinger_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = int(os.environ.get("SB_N", 16 if smoke else 48))
    conc = int(os.environ.get("SB_CONC", 8 if smoke else 16))
    max_batch = int(os.environ.get("SB_MAX_BATCH", 8))
    window_ms = float(os.environ.get("SB_WINDOW_MS", 25))

    with tempfile.TemporaryDirectory() as tmp:
        log(f"building pipeline (smoke={smoke})...")
        infer, hp = build_infer(tmp, smoke)
        bench_mode(infer, hp, max_batch, n, conc, window_ms)
        if os.environ.get("SB_COMPARE", "1") == "1" and max_batch > 1:
            bench_mode(infer, hp, 1, n, conc, window_ms)


if __name__ == "__main__":
    main()
