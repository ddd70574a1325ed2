"""Sampler-quality harness: fast samplers vs the DDPM-1000 chain.

Trains a small DiffSingerMIDI on the synthetic corpus until the denoiser
is non-trivial, then samples the SAME conditioner/params/initial noise
with the DDPM-1000 reference chain, 200-NFE PLMS (production parity,
`usr/configs/m4-detect-ori-shift/diff.yaml:16-23`) and 40-NFE
DPM-Solver++(2M), and reports mel MAE / mean SSIM of each fast sampler
against DDPM-1000 (BASELINE.md "fast-sampler quality" row).

Caveat (documented in BASELINE.md too): with a briefly-trained model the
numbers measure *sampler agreement on a non-random denoiser*, not final
audio quality — that is the point: they bound the trajectory error the
fast samplers introduce. Expect the PLMS row to diverge on an
under-trained model: like the reference `p_sample_plms`
(`usr/diff/shallow_diffusion_tts.py:168-201`, parity-tested in
tests/test_reference_parity.py) it does not clamp the x0 prediction, so
multistep extrapolation amplifies denoiser error, while the DDPM chain
clips x0 each step. DPM-Solver++'s data-prediction form is
self-stabilising and tracks DDPM-1000 closely even here.

Run: python scripts/sampler_quality.py            (real chip)
     SQ_PLATFORM=cpu python scripts/sampler_quality.py   (host smoke)
Env: SQ_STEPS (400), SQ_FRAMES (256).

SQ_CKPT=<dir> (e.g. artifacts/flagship): skip the toy training and run
the three samplers on the TRAINED flagship checkpoint
(scripts/train_flagship.py export) over its own validation batch —
this settles the BASELINE.md open question of whether the clamp-free
PLMS-200 parity sampler converges on a properly trained denoiser.
SQ_DATA (default /tmp/bisinger_flagship) points at the flagship work
dir for the binarized corpus; it is re-binarized from the deterministic
synthetic corpus if missing.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[sq] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    if os.environ.get("SQ_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SQ_PLATFORM"])
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/bisinger_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.data.binarizer import M4SingerBinarizer
    from bisinger_tpu.data.dataset import DataLoader, M4SingerDataset
    from bisinger_tpu.data.synthetic import make_synthetic_corpus
    from bisinger_tpu.training import losses as L
    from bisinger_tpu.training.tasks import DiffSingerMIDITask
    from bisinger_tpu.training.trainer import device_batch

    steps = int(os.environ.get("SQ_STEPS", 400))
    frames = int(os.environ.get("SQ_FRAMES", 256))

    ckpt = os.environ.get("SQ_CKPT", "")
    if ckpt:
        return run_on_checkpoint(ckpt)

    root = tempfile.mkdtemp(prefix="sampler_quality_")
    make_synthetic_corpus(os.path.join(root, "raw"), n_items=24, seed=0)

    def hp_for(sampler):
        # sampler dispatch (models/diffusion.py): dpmpp explicit; plms
        # when pndm_speedup set; ancestral DDPM otherwise
        over = dict(
            raw_data_dir=os.path.join(root, "raw"),
            raw_json_fn="meta.json",
            binary_data_dir=os.path.join(root, "binary"),
            test_prefixes=["Alto-1#song0"],
            hidden_size=64,
            enc_layers=2,
            dec_layers=2,
            num_heads=2,
            residual_layers=10,
            residual_channels=64,
            dilation_cycle_length=4,
            timesteps=1000,
            K_step=1000,
            schedule_type="linear",
            max_beta=0.02,
            gaussian_start=True,
            use_pitch_embed=False,
            num_spk=4,
            max_frames=frames,
            bucket_tokens=[48],
            bucket_frames=[frames],
            max_tokens=8000,
            lr=2e-4,
        )
        if sampler == "plms":
            over["pndm_speedup"] = 5  # 1000/5 = 200 NFE (production parity)
        elif sampler == "dpmpp":
            over["diff_sampler"] = "dpmpp"
            over["dpm_steps"] = 40
        else:
            over["pndm_speedup"] = 0  # ancestral DDPM, 1000 NFE
        return load_hparams(overrides=over)

    hp = hp_for("plms")
    if not os.path.exists(os.path.join(root, "binary", "train_lengths.npy")):
        M4SingerBinarizer(hp).process()

    ds = M4SingerDataset(hp, "train", shuffle=True)
    dl = DataLoader(ds, hp, shuffle=True, endless=True)
    it = iter(dl)

    task = DiffSingerMIDITask(hp, vocab_size=64)
    rng = jax.random.PRNGKey(0)
    first = device_batch(next(it))
    state = task.init_state(rng, first)
    log(f"training {steps} steps...")
    t0 = time.perf_counter()
    for i in range(steps):
        batch = device_batch(next(it))
        state, losses = task.train_step(state, batch, jax.random.fold_in(rng, i))
        if i % 100 == 0:
            log(f"step {i}: mel={float(losses.get('mel', 0.0)):.4f}")
    log(f"trained in {time.perf_counter() - t0:.1f}s")
    params = jax.device_get(state.params)

    val_ds = M4SingerDataset(hp, "valid", shuffle=False)
    val_dl = DataLoader(val_ds, hp, shuffle=False)
    vbatch = device_batch(next(iter(val_dl)))
    sample_rng = jax.random.PRNGKey(1234)

    mels = {}
    for sampler in ("ddpm", "plms", "dpmpp"):
        t = DiffSingerMIDITask(hp_for(sampler), vocab_size=64)
        t0 = time.perf_counter()
        ret = t.infer_step(params, vbatch, sample_rng)
        mel = np.asarray(ret["mel_out"])
        log(f"{sampler}: sampled in {time.perf_counter() - t0:.1f}s")
        mels[sampler] = mel

    ref = mels["ddpm"]
    nonpad = (np.abs(ref).sum(-1, keepdims=True) > 1e-8).astype(np.float32)
    out = {"steps_trained": steps, "nfe": {"ddpm": 1000, "plms": 200, "dpmpp": 40}}
    import jax.numpy as jnp

    for s in ("plms", "dpmpp"):
        diff = np.abs(mels[s] - ref) * nonpad
        mae = float(diff.sum() / (nonpad.sum() * ref.shape[-1]))
        sm = float(
            np.asarray(
                L.ssim(jnp.asarray(mels[s]), jnp.asarray(ref)).mean()
            )
        )
        out[s] = {"mel_mae_vs_ddpm1000": round(mae, 4), "ssim_vs_ddpm1000": round(sm, 4)}
    print(json.dumps(out))


def run_on_checkpoint(ckpt):
    """Sampler agreement on the trained flagship model (SQ_CKPT mode)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.data.binarizer import M4SingerBinarizer
    from bisinger_tpu.data.dataset import DataLoader, M4SingerDataset
    from bisinger_tpu.data.synthetic import make_synthetic_corpus
    from bisinger_tpu.training import losses as L
    from bisinger_tpu.training.tasks import DiffSingerMIDITask
    from bisinger_tpu.training.trainer import device_batch
    from bisinger_tpu.utils.text_encoder import build_phone_encoder
    from bisinger_tpu.vocoders.hifigan import unflatten_params

    data_root = os.environ.get("SQ_DATA", "/tmp/bisinger_flagship")
    with open(os.path.join(ckpt, "hparams_diff.json")) as f:
        fhp = json.load(f)

    def hp_for(sampler):
        over = dict(fhp)
        over.update(
            raw_data_dir=os.path.join(data_root, "raw"),
            binary_data_dir=os.path.join(data_root, "binary"),
            # sample a modest batch: the DDPM chain is 1000 NFE
            max_sentences=int(os.environ.get("SQ_B", 8)),
            max_eval_sentences=int(os.environ.get("SQ_B", 8)),
        )
        if sampler == "plms":
            over.update(diff_sampler="plms", pndm_speedup=5)
        elif sampler.startswith("dpmpp"):
            # "dpmpp" = 40 NFE; "dpmpp20"/"dpmpp10"/... sweep the ODE
            # solver's NFE frontier on the trained model
            over.update(
                diff_sampler="dpmpp", dpm_steps=int(sampler[5:] or 40)
            )
        else:
            over.update(diff_sampler="plms", pndm_speedup=0)  # ancestral DDPM
        return load_hparams(overrides=over)

    hp = hp_for("plms")
    if not os.path.exists(os.path.join(hp["binary_data_dir"], "phone_set.json")):
        log("flagship binary corpus missing; re-binarizing (deterministic, seed 0)")
        if not os.path.exists(os.path.join(hp["raw_data_dir"], "meta.json")):
            make_synthetic_corpus(hp["raw_data_dir"], n_items=int(fhp.get("_n_items", 512)), seed=0)
        M4SingerBinarizer(hp).process()
    vocab = build_phone_encoder(hp["binary_data_dir"]).vocab_size

    params = unflatten_params(
        dict(np.load(os.path.join(ckpt, "diff_params.npz"), allow_pickle=False))
    )
    val_ds = M4SingerDataset(hp, "valid", shuffle=False)
    vbatch = device_batch(next(iter(DataLoader(val_ds, hp, shuffle=False))))
    sample_rng = jax.random.PRNGKey(1234)

    samplers = os.environ.get("SQ_SAMPLERS", "ddpm,plms,dpmpp").split(",")
    if "ddpm" not in samplers:
        samplers = ["ddpm"] + samplers
    mels = {}
    for sampler in samplers:
        t = DiffSingerMIDITask(hp_for(sampler), vocab_size=vocab)
        t0 = time.perf_counter()
        ret = t.infer_step(params, vbatch, sample_rng)
        mels[sampler] = np.asarray(ret["mel_out"])
        log(f"{sampler}: sampled in {time.perf_counter() - t0:.1f}s")

    def nfe_of(s):
        if s == "ddpm":
            return 1000
        if s == "plms":
            return 200
        return int(s[5:] or 40)

    ref = mels["ddpm"]
    nonpad = (np.asarray(vbatch["mel2ph"]) > 0)[:, :, None].astype(np.float32)
    gt = np.asarray(vbatch["mels"])
    out = {
        "ckpt": ckpt,
        "nfe": {s: nfe_of(s) for s in samplers},
        "gt_mae": {},  # vs ground-truth mel: absolute quality anchor
    }
    for s in samplers:
        d = np.abs(mels[s] - gt) * nonpad
        out["gt_mae"][s] = round(float(d.sum() / (nonpad.sum() * gt.shape[-1])), 4)
        if s == "ddpm":
            continue
        diff = np.abs(mels[s] - ref) * nonpad
        mae = float(diff.sum() / (nonpad.sum() * ref.shape[-1]))
        sm = float(np.asarray(L.ssim(jnp.asarray(mels[s]), jnp.asarray(ref)).mean()))
        out[s] = {"mel_mae_vs_ddpm1000": round(mae, 4), "ssim_vs_ddpm1000": round(sm, 4)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
