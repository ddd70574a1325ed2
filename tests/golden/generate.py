"""Regenerate the golden fixtures (run from repo root on CPU):

  JAX_PLATFORMS=cpu python tests/golden/generate.py

Each fixture is small (<100 KB) and records fixed-seed outputs of a
numerics-critical path. Regenerate ONLY when an intentional numerical
change lands, and note it in the commit message.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

OUT = os.path.dirname(os.path.abspath(__file__))


def gen_dsp():
    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.utils import audio as A

    hp = load_hparams()
    rng = np.random.default_rng(1234)
    t = np.arange(24000 // 2) / 24000.0
    wav = (0.5 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(len(t))).astype(
        np.float32
    )
    wav_out, mel = A.wav2spec(
        wav,
        sample_rate=hp["audio_sample_rate"],
        fft_size=hp["fft_size"],
        hop_size=hp["hop_size"],
        win_size=hp["win_size"],
        num_mels=hp["audio_num_mel_bins"],
        fmin=hp["fmin"],
        fmax=hp["fmax"],
        eps=1e-6,
    )
    np.savez_compressed(
        os.path.join(OUT, "dsp_mel.npz"), wav=wav[:2048], mel=mel.astype(np.float32)
    )
    print("dsp_mel.npz", mel.shape)


def gen_fs2():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _batch, _tiny_hp
    from bisinger_tpu.training.tasks import AuxDecoderMIDITask

    hp = _tiny_hp()
    task = AuxDecoderMIDITask(hp, 32)
    batch = _batch(2, 16, 64, 32)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    ret = task._forward(state.params, batch, jax.random.PRNGKey(1), deterministic=True)
    np.savez_compressed(
        os.path.join(OUT, "fs2_forward.npz"),
        mel_out=np.asarray(ret["mel_out"], np.float32),
        dur=np.asarray(ret["dur"], np.float32),
    )
    print("fs2_forward.npz", ret["mel_out"].shape)


def gen_diffusion():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _batch, _tiny_hp
    from bisinger_tpu.training.tasks import DiffSingerMIDITask

    hp = _tiny_hp()
    task = DiffSingerMIDITask(hp, 32)
    batch = _batch(2, 16, 64, 32)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    ret = task.infer_step(state.params, batch, jax.random.PRNGKey(2))
    np.savez_compressed(
        os.path.join(OUT, "diffusion_infer.npz"),
        mel_out=np.asarray(ret["mel_out"], np.float32),
    )
    print("diffusion_infer.npz", ret["mel_out"].shape)


if __name__ == "__main__":
    gen_dsp()
    gen_fs2()
    gen_diffusion()
