"""train_m4singer (paper systems 1/2) compatibility: the original
monolingual M4Singer binarizer path (no word_boundary/lang/speechsing in
meta — reference `train_m4singer/binarize.py:288-396`), the PopCS
`MidiSingingBinarizer` (`binarize.py:184-282`), the lang-free
FastSpeech2MIDI variant, and the EN->CN phone substitution tables of the
monolingual inference apps (`bisinger-inference/a-m4{,-avg}.py`)."""

import json
import os

import jax
import numpy as np
import pytest

from bisinger_tpu.config import load_hparams
from bisinger_tpu.data.binarizer import (
    M4SingerBinarizer,
    MidiSingingBinarizer,
    derive_word_boundary,
)
from bisinger_tpu.data.synthetic import make_synthetic_corpus
from bisinger_tpu.data.text.frontend import EN_PHONE_SUBST, BilingualFrontend
from bisinger_tpu.utils.text_encoder import build_phone_encoder


def _tiny_overrides(raw, binary):
    return dict(
        raw_data_dir=str(raw),
        raw_json_fn="meta.json",
        binary_data_dir=str(binary),
        hidden_size=32, enc_layers=1, dec_layers=1, num_heads=2,
        enc_ffn_kernel_size=3, dec_ffn_kernel_size=3,
        residual_layers=2, residual_channels=32,
        timesteps=8, K_step=8,
        dur_predictor_layers=2, predictor_layers=2,
        use_pitch_embed=False, num_spk=4, max_words=16,
        bucket_tokens=[32], bucket_frames=[256],
        use_lang_embed=False, use_style_embed=False,
        test_num=1,
    )


def test_derive_word_boundary_yunmu_rule():
    phs = ["sh", "ang", "x", "in", "<SP>", "a"]
    assert derive_word_boundary(phs) == [0, 1, 0, 1, 1, 1]


def test_original_meta_binarize_and_train(tmp_path):
    """Meta WITHOUT word_boundary/lang/speechsing binarizes; the lang-free
    FastSpeech2MIDI trains a step on the result."""
    raw = tmp_path / "raw"
    make_synthetic_corpus(str(raw), n_items=6, seed=0, fmt="m4_original")
    # confirm the meta really lacks the bilingual fields
    with open(raw / "meta.json") as f:
        first = json.loads(f.readline())
    assert "word_boundary" not in first and "lang" not in first

    hp = load_hparams(overrides=_tiny_overrides(raw, tmp_path / "bin"))
    M4SingerBinarizer(hp).process()
    encoder = build_phone_encoder(hp["binary_data_dir"])

    from __graft_entry__ import _batch
    from bisinger_tpu.training.tasks import AuxDecoderMIDITask

    task = AuxDecoderMIDITask(hp, encoder.vocab_size)
    # the lang-free variant must not create esm/lang/style params
    batch = _batch(2, 16, 64, encoder.vocab_size)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    names = "/".join(jax.tree_util.keystr(p) for p, _ in flat)
    assert "esm" not in names and "lang_embed" not in names
    assert "style_embed" not in names

    new_state, logs = task.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["total_loss"]))


def test_popcs_binarizer(tmp_path):
    raw = tmp_path / "raw"
    make_synthetic_corpus(str(raw), n_items=6, seed=1, fmt="popcs")
    hp = load_hparams(
        overrides=dict(
            _tiny_overrides(raw, tmp_path / "bin"),
            processed_data_dir=str(raw),
            test_prefixes=["song0"],
        )
    )
    b = MidiSingingBinarizer(hp)
    b.load_meta_data()
    # every item resolved an explicit wav_fn and derived a word boundary
    for item in b.items.values():
        assert os.path.exists(item["wav_fn"])
        assert len(item["word_boundary"]) == len(item["ph"].split())
    # containment split: every song0 sentence held out
    train, test = b.split_train_test()
    assert test and all("song0" in n for n in test)
    assert not any("song0" in n for n in train)
    b.process()
    assert os.path.exists(os.path.join(hp["binary_data_dir"], "train.idx"))


@pytest.mark.parametrize("system", ["system1", "system2"])
def test_en_phone_substitution(system):
    """'they' -> DH EY: DH must be replaced per the system table; the
    note/slur alignment survives the rewrite."""

    class _Enc:
        def encode(self, s):
            return list(range(len(s.split())))

    fe = BilingualFrontend(_Enc(), phone_subst=system)
    ret = fe.preprocess_word_level(
        {"text": "SP they", "notes": "rest | C4 D4", "notes_duration": "0.1 | 0.3 0.2"}
    )
    phones = ret["ph_seq"].split()
    table = EN_PHONE_SUBST[system]
    assert "DH" not in phones and "^" not in phones
    assert table["DH"] in phones
    assert len(phones) == len(ret["note_lst"]) == len(ret["is_slur"])


def test_system1_v_w_collapse():
    """system1 maps V and W -> UW; system2 maps V -> W only
    (a-m4-avg.py:405-408 vs a-m4.py:405-406)."""
    assert EN_PHONE_SUBST["system1"]["W"] == "UW"
    assert EN_PHONE_SUBST["system1"]["V"] == "UW"
    assert EN_PHONE_SUBST["system2"]["V"] == "W"
    assert "W" not in EN_PHONE_SUBST["system2"]


def test_m4singer_config_cascade():
    hp = load_hparams("usr/m4singer/system2.yaml")
    assert hp["use_midi"] and not hp["use_lang_embed"]
    assert hp["en_phone_subst"] == "system2"
    hp1 = load_hparams("usr/m4singer/system1.yaml")
    assert hp1["en_phone_subst"] == "system1"
