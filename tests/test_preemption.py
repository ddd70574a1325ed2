"""Preemption-safe checkpointing: SIGTERM mid-run -> checkpoint at the
next step boundary + clean exit; a rerun resumes from that exact step.

TPU pods get SIGTERM + a short grace window on eviction; the trainer's
handler (training/trainer.py fit) must save without running validation
and without marking the preemption checkpoint as 'best'."""

import os
import signal
import subprocess
import sys
import time

import pytest

from bisinger_tpu.config import load_hparams
from bisinger_tpu.data.binarizer import M4SingerBinarizer
from bisinger_tpu.data.synthetic import make_synthetic_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys
from bisinger_tpu.config import load_hparams
from bisinger_tpu.training.tasks import AuxDecoderMIDITask
from bisinger_tpu.training.trainer import Trainer
from bisinger_tpu.utils.text_encoder import build_phone_encoder

root = sys.argv[1]
hp = load_hparams(config_path=root + "/hp.yaml")
enc = build_phone_encoder(hp["binary_data_dir"])
task = AuxDecoderMIDITask(hp, enc.vocab_size)
Trainer(task, hp).fit(max_updates=100000)
print("FIT-RETURNED", flush=True)
"""


@pytest.fixture(scope="module")
def preempt_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("preempt")
    raw = str(root / "raw")
    make_synthetic_corpus(raw, n_items=10, seed=0)
    hp = load_hparams(
        overrides=dict(
            raw_data_dir=raw,
            raw_json_fn="meta.json",
            binary_data_dir=str(root / "binary"),
            work_dir=str(root / "work"),
            num_spk=4,
            test_prefixes=["Alto-1#song0"],
            pitch_extractor="autocorr",
            hidden_size=16,
            enc_layers=1,
            dec_layers=1,
            enc_ffn_kernel_size=3,
            dec_ffn_kernel_size=3,
            residual_layers=2,
            residual_channels=16,
            timesteps=4,
            K_step=4,
            predictor_layers=2,
            dur_predictor_layers=2,
            use_pitch_embed=False,
            bucket_tokens=[32],
            bucket_frames=[256],
            max_tokens=4000,
            max_sentences=8,
            max_words=32,
            log_interval=2,
            val_check_interval=10000,  # force the preemption save path
            num_sanity_val_steps=0,
            num_ckpt_keep=2,
            warmup_updates=2,
            lr=1e-3,
            clip_grad_norm=1.0,
            save_codes=False,
        )
    )
    M4SingerBinarizer(hp).process()
    # persist the resolved config for the child process
    import yaml

    with open(root / "hp.yaml", "w") as f:
        yaml.safe_dump(
            {k: v for k, v in hp.to_dict().items() if k != "base_config"}, f
        )
    return hp, str(root)


def test_sigterm_checkpoints_and_resumes(preempt_env):
    hp, root = preempt_env
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", CHILD, root],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
    )
    # wait until training is demonstrably under way (first [tr] log line)
    seen = []
    deadline = time.time() + 300
    for line in proc.stdout:
        seen.append(line)
        if "[tr]" in line:
            break
        assert time.time() < deadline, "".join(seen)
    else:
        pytest.fail("child exited before training started:\n" + "".join(seen))

    proc.send_signal(signal.SIGTERM)
    try:
        out = proc.stdout.read()
        rc = proc.wait(timeout=300)
    except subprocess.TimeoutExpired:
        proc.kill()
        pytest.fail("child did not exit after SIGTERM:\n" + "".join(seen))
    full = "".join(seen) + out

    assert rc == 0, full
    assert "caught signal" in full, full
    assert "preemption checkpoint saved at step" in full, full
    assert "FIT-RETURNED" in full, full  # clean return, not an exception

    saved_step = int(
        full.split("preemption checkpoint saved at step")[1].split()[0]
    )
    assert saved_step > 0

    # resume: a fresh trainer restores exactly the preemption step
    from bisinger_tpu.training.tasks import AuxDecoderMIDITask
    from bisinger_tpu.training.trainer import Trainer
    from bisinger_tpu.utils.text_encoder import build_phone_encoder

    enc = build_phone_encoder(hp["binary_data_dir"])
    task = AuxDecoderMIDITask(hp, enc.vocab_size)
    trainer = Trainer(task, hp)
    assert trainer.ckpt.latest_step() == saved_step
    trainer.fit(max_updates=saved_step + 2)
    assert trainer.global_step == saved_step + 2
