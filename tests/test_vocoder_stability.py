"""Vocoder GAN stability: multi-step training + trained-weight round-trip.

Complements the single-step smoke tests in test_vocoder_training.py:
drives `scripts/train_vocoder.py` for enough adversarial steps to see
loss movement, then asserts the D/G balance stayed sane and the trained
generator round-trips through the `vocoders/hifigan.py` checkpoint glob
with a better vocoded mel-L1 than its random init.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_gan_stability_and_roundtrip(tmp_path):
    env = dict(
        os.environ,
        TV_STEPS="60",
        TV_CHANNELS="16",
        TV_FRAMES="16",
        TV_BATCH="2",
        TV_IMPROVE="0.97",  # smoke bar: moving the right way, not converged
        TV_DMIN="0.0",  # D winning early is normal; balance is the 400-step bar
        TV_OUT=str(tmp_path),
        TV_PLATFORM="cpu",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_vocoder.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    # no NaN + D not blown up + mel loss trending down
    assert summary["ok"], summary
    assert summary["disc_loss_last"] < 8.0, summary
    assert summary["gen_mel_last"] < summary["gen_mel_first"], summary
    # trained generator loaded from generator_*.npz beats random init
    assert summary["mel_l1_vocoded_trained"] < summary["mel_l1_vocoded_init"]
    # history + checkpoint artifacts exist
    assert (tmp_path / "history.json").exists()
    assert list((tmp_path / "vocoder").glob("generator_*.npz"))
