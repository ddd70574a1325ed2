"""Inference batch-axis bucketing (inference/pipeline.py items_to_batch):
variable micro-batch group sizes must map onto a fixed set of compiled
programs, and padding rows must not change real items' outputs."""

import jax
import numpy as np
import pytest

from bisinger_tpu.config import load_hparams
from bisinger_tpu.data.binarizer import M4SingerBinarizer
from bisinger_tpu.data.synthetic import make_synthetic_corpus
from bisinger_tpu.inference.pipeline import SVSInfer
from bisinger_tpu.training.tasks import DiffSingerMIDITask
from bisinger_tpu.utils.text_encoder import build_phone_encoder

SCORE = {
    "text": "SP wo ni SP",
    "notes": "rest | C4 | D4 | rest",
    "notes_duration": "0.1 | 0.3 | 0.3 | 0.1",
}


@pytest.fixture(scope="module")
def infer(tmp_path_factory):
    root = tmp_path_factory.mktemp("bb")
    raw = root / "raw"
    make_synthetic_corpus(str(raw), n_items=4, seed=0)
    hp = load_hparams(
        overrides=dict(
            raw_data_dir=str(raw),
            raw_json_fn="meta.json",
            binary_data_dir=str(root / "bin"),
            hidden_size=32, enc_layers=1, dec_layers=1, num_heads=2,
            residual_layers=2, residual_channels=32,
            timesteps=8, K_step=8, pndm_speedup=2,
            dur_predictor_layers=2, predictor_layers=2,
            use_pitch_embed=False, num_spk=4,
            bucket_tokens=[32], bucket_frames=[256],
            test_num=1,
        )
    )
    assert hp["bucket_batch_sizes"]  # default-on
    M4SingerBinarizer(hp).process()
    encoder = build_phone_encoder(hp["binary_data_dir"])
    task = DiffSingerMIDITask(hp, encoder.vocab_size)
    from __graft_entry__ import _batch

    state = task.init_state(
        jax.random.PRNGKey(0), _batch(1, 32, 256, encoder.vocab_size)
    )
    inst = SVSInfer(hp, diffusion_params=jax.device_get(state.params))
    return inst


def test_batch_padded_to_bucket(infer):
    items = [infer.frontend(SCORE, infer.spk_map) for _ in range(3)]
    batch = infer.items_to_batch(items)
    assert batch["txt_tokens"].shape[0] == 4  # 3 -> bucket 4
    assert batch["spk_ids"].shape[0] == 4
    assert batch["speechsing"].shape[0] == 4


def test_bucket_disabled_uses_exact_size(infer):
    hp2 = infer.hp.replace(bucket_batch_sizes=[])
    old = infer.hp
    infer.hp = hp2
    try:
        items = [infer.frontend(SCORE, infer.spk_map) for _ in range(3)]
        assert infer.items_to_batch(items)["txt_tokens"].shape[0] == 3
    finally:
        infer.hp = old


def test_padding_rows_do_not_change_outputs(infer):
    """infer_batch over 3 scores (padded to 4) == infer_batch over 4
    scores trimmed: the padded row must not perturb real rows."""
    wavs3 = infer.infer_batch([SCORE, SCORE, SCORE], rng=jax.random.PRNGKey(5))
    wavs4 = infer.infer_batch(
        [SCORE, SCORE, SCORE, SCORE], rng=jax.random.PRNGKey(5)
    )
    assert len(wavs3) == 3 and len(wavs4) == 4
    for a, b in zip(wavs3, wavs4[:3]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


def test_oversize_group_uses_exact_size(infer):
    """Groups past the largest bucket must NOT be truncated — fall back
    to the exact size."""
    hp2 = infer.hp.replace(bucket_batch_sizes=[1, 2])
    old = infer.hp
    infer.hp = hp2
    try:
        items = [infer.frontend(SCORE, infer.spk_map) for _ in range(5)]
        assert infer.items_to_batch(items)["txt_tokens"].shape[0] == 5
    finally:
        infer.hp = old
