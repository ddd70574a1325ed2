"""Same-host PyTorch anchor for the BASELINE.json ">=5x PyTorch-GPU"
acceptance criterion (round-4 verdict #6).

The criterion as written is unmeasurable in-env (no GPU, and the
reference's GPU environment is a 2018-era RTX 2080 per
`requirements_2080.txt`), so this script records the measurable proxy:
the REFERENCE'S OWN torch stack (imported from /root/reference via
compat/ref_loader, production m4-detect-ori-shift dims) versus this
framework, both on the same host CPU, one short utterance at matched
NFE and shapes:

  FastSpeech2MIDI -> GaussianDiffusion PLMS (K=1000, speedup 5 ->
  200 NFE; reference PLMS is batch-1 only, `shallow_diffusion_tts.py:189`)
  -> PitchExtractor -> NSF HiFi-GAN (512-channel, hop 128)

Reference timing hooks being matched: the audio-seconds counter in
`tasks/tts/fs2.py:624-630` and the vocoder timer `vocoders/hifigan.py:59`.

Run both sides:
  python scripts/bench_torch_anchor.py            # torch side (this file)
  BENCH_PLATFORM=cpu BENCH_B=1 BENCH_VOC_FOLD=0 python bench.py   # ours

Env: TA_T_MEL (1024)  TA_RUNS (2)  TA_THREADS (0 = torch default)
Prints one JSON line with audio-s/s for the torch reference stack.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    t_mel = int(os.environ.get("TA_T_MEL", 1024))
    n_runs = int(os.environ.get("TA_RUNS", 2))
    t_txt = 128
    vocab = 64

    import torch

    if int(os.environ.get("TA_THREADS", 0)):
        torch.set_num_threads(int(os.environ["TA_THREADS"]))

    from bisinger_tpu.compat import ref_loader

    assert ref_loader.reference_available()
    r = ref_loader.load_reference("usr/configs/m4-detect-ori-shift/diff.yaml")
    hp = r.hparams
    assert hp["K_step"] == 1000 and hp["pndm_speedup"] == 5  # 200 NFE

    torch.manual_seed(0)
    net = r.diffnet_module.DiffNet(80)
    torch.nn.init.normal_(net.output_projection.weight, std=0.1)
    gd = r.diffusion_module.GaussianDiffusion(
        phone_encoder=ref_loader.Reference.FakeDictionary(vocab),
        out_dims=80,
        denoise_fn=net,
        timesteps=hp["timesteps"],
        K_step=hp["K_step"],
        loss_type=hp["diff_loss_type"],
        spec_min=hp["spec_min"],
        spec_max=hp["spec_max"],
    )
    gd.eval()
    tpe = r.pe_module.PitchExtractor().eval()
    h = dict(
        resblock="1",
        resblock_kernel_sizes=[3, 7, 11],
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        upsample_rates=[8, 4, 2, 2],
        upsample_kernel_sizes=[16, 8, 4, 4],
        upsample_initial_channel=512,
        use_pitch_embed=True,
        audio_sample_rate=int(hp["audio_sample_rate"]),
    )
    tvoc = r.hifigan_module.HifiGanGenerator(h).eval()

    # B=1 inputs at the bench.py shapes (reference PLMS cannot batch)
    rng = np.random.default_rng(0)
    txt = rng.integers(1, vocab, (1, t_txt))
    mel2ph = np.minimum(
        np.arange(t_mel)[None] * t_txt // t_mel + 1, t_txt
    ).astype(np.int64)
    inp = dict(
        txt_tokens=torch.as_tensor(txt),
        mel2ph=torch.as_tensor(mel2ph),
        spk_embed=torch.zeros(1, dtype=torch.long),
        pitch_midi=torch.as_tensor(rng.integers(40, 90, (1, t_txt))),
        midi_dur=torch.as_tensor(
            rng.uniform(0.05, 0.6, (1, t_txt)).astype(np.float32)
        ),
        is_slur=torch.zeros(1, t_txt, dtype=torch.long),
        lang=torch.as_tensor(rng.integers(0, 2, (1, t_txt))),
        speechsing=torch.ones(1, dtype=torch.long),
    )

    def synth():
        with torch.no_grad():
            ret = gd(
                inp["txt_tokens"],
                inp["mel2ph"],
                inp["spk_embed"],
                infer=True,
                pitch_midi=inp["pitch_midi"],
                midi_dur=inp["midi_dur"],
                is_slur=inp["is_slur"],
                lang=inp["lang"],
                speechsing=inp["speechsing"],
            )
            mel = ret["mel_out"]
            f0 = tpe(mel)["f0_denorm_pred"]
            wav = tvoc(mel.transpose(1, 2), f0=f0)
        return wav

    # one untimed pass to page in weights / intra-op thread pools
    print("[anchor] warmup...", file=sys.stderr, flush=True)
    synth()
    times = []
    for i in range(n_runs):
        t0 = time.perf_counter()
        synth()
        times.append(time.perf_counter() - t0)
        print(f"[anchor] run {i}: {times[-1]:.1f}s", file=sys.stderr, flush=True)
    dt = min(times)
    audio_s = t_mel * 128 / hp["audio_sample_rate"]
    print(
        json.dumps(
            {
                "metric": "torch_reference_cpu_audio_s_per_s",
                "value": round(audio_s / dt, 4),
                "unit": f"audio-s/s (B=1, T={t_mel}, 200-NFE PLMS + PE + NSF, "
                f"torch {torch.__version__} {torch.get_num_threads()} threads)",
                "wall_s": round(dt, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
