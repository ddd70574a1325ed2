"""Full-stack serving test: real SVSInfer (restored checkpoint) behind
the HTTP endpoint — score JSON in, RIFF audio out."""

import json
import os
import urllib.request

import jax
import numpy as np
import pytest

from bisinger_tpu.config import load_hparams
from bisinger_tpu.data.binarizer import M4SingerBinarizer
from bisinger_tpu.data.synthetic import make_synthetic_corpus
from bisinger_tpu.inference.pipeline import SVSInfer
from bisinger_tpu.inference.server import serve
from bisinger_tpu.training.checkpoints import CheckpointManager
from bisinger_tpu.training.tasks import DiffSingerMIDITask
from bisinger_tpu.utils.text_encoder import build_phone_encoder
from bisinger_tpu.vocoders.hifigan import HifiGAN


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    raw = root / "raw"
    make_synthetic_corpus(str(raw), n_items=6, seed=0)
    hp = load_hparams(
        overrides=dict(
            raw_data_dir=str(raw),
            raw_json_fn="meta.json",
            binary_data_dir=str(root / "bin"),
            hidden_size=32, enc_layers=1, dec_layers=1, num_heads=2,
            enc_ffn_kernel_size=3, dec_ffn_kernel_size=3,
            residual_layers=2, residual_channels=32,
            timesteps=8, K_step=8, pndm_speedup=2,
            dur_predictor_layers=2, predictor_layers=2,
            use_pitch_embed=False, num_spk=4, max_words=16,
            bucket_tokens=[32], bucket_frames=[256],
            upsample_rates=[4, 4, 4, 2], upsample_kernel_sizes=[8, 8, 8, 4],
            upsample_initial_channel=32,
            vocoder_ckpt=str(root / "voc"),
            test_num=1,
        )
    )
    M4SingerBinarizer(hp).process()
    encoder = build_phone_encoder(hp["binary_data_dir"])

    # "train" zero steps: init a state and save it as the checkpoint
    task = DiffSingerMIDITask(hp, encoder.vocab_size)
    from __graft_entry__ import _batch

    state = task.init_state(
        jax.random.PRNGKey(0), _batch(1, 32, 256, encoder.vocab_size)
    )
    work = root / "work"
    mgr = CheckpointManager(str(work / "ckpt"))
    mgr.save(1, jax.device_get(state))

    vocoder = HifiGAN(hp)
    vocoder.save_params(0)  # write generator npz so .loaded becomes real
    vocoder = HifiGAN(hp)
    assert vocoder.loaded

    infer = SVSInfer.from_work_dir(hp, str(work), vocoder=vocoder)
    httpd = serve(infer, host="127.0.0.1", port=0)
    yield httpd.server_address[1]
    httpd.shutdown()


def test_http_score_to_wav(served):
    port = served
    score = {
        "item_name": "demo",
        "text": "SP wo ni SP",
        "notes": "rest | C4 | D4 | rest",
        "notes_duration": "0.1 | 0.3 | 0.3 | 0.1",
    }
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/synthesize",
        data=json.dumps(score).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        body = r.read()
    assert r.headers["Content-Type"] == "audio/wav"
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    assert len(body) > 44  # some PCM payload (untrained => short is fine)
