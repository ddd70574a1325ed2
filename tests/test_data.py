import json
import os

import numpy as np
import pytest

from bisinger_tpu.config import load_hparams
from bisinger_tpu.data.binarizer import M4SingerBinarizer, ph_durs_to_mel2ph
from bisinger_tpu.data.dataset import (
    DataLoader,
    M4SingerDataset,
    batch_by_size,
    collate_batch,
    pick_bucket,
)
from bisinger_tpu.data.records import RecordReader, RecordWriter, decode_record, encode_record
from bisinger_tpu.data.synthetic import make_synthetic_corpus


class TestRecords:
    def test_roundtrip_codec(self):
        item = {
            "name": "foo#bar#0001",
            "mel": np.random.RandomState(0).randn(17, 80).astype(np.float32),
            "phone": np.arange(5, dtype=np.int64),
            "spk_id": 3,
            "sec": 1.25,
            "none_field": None,
            "blob": b"\x00\x01",
        }
        blob = encode_record(item)
        out = decode_record(memoryview(blob))
        assert out["name"] == item["name"]
        np.testing.assert_array_equal(out["mel"], item["mel"])
        np.testing.assert_array_equal(out["phone"], item["phone"])
        assert out["spk_id"] == 3 and out["sec"] == 1.25
        assert out["none_field"] is None and out["blob"] == b"\x00\x01"

    def test_writer_reader_shard(self, tmp_path):
        prefix = str(tmp_path / "train")
        rng = np.random.RandomState(1)
        items = [
            {"i": k, "x": rng.randn(rng.randint(2, 30)).astype(np.float32)}
            for k in range(25)
        ]
        with RecordWriter(prefix) as w:
            for it in items:
                w.add_item(it)
        r = RecordReader(prefix)
        assert len(r) == 25
        for k in (0, 7, 24, -1):
            got = r[k]
            want = items[k % 25] if k >= 0 else items[-1]
            assert got["i"] == want["i"]
            np.testing.assert_array_equal(got["x"], want["x"])
        with pytest.raises(IndexError):
            r[25]


class TestAlignment:
    def test_ph_durs_to_mel2ph(self):
        # 2 phones of 0.1s at sr=1000, hop=100 -> 1 frame each
        mel2ph = ph_durs_to_mel2ph([0.1, 0.1], 3, 100, 1000)
        assert mel2ph.tolist() == [1, 2, 0]

    def test_cumulative_rounding_no_drift(self):
        durs = [0.033] * 30  # individually ~6.2 frames at 24k/128
        mel2ph = ph_durs_to_mel2ph(durs, 200, 128, 24000)
        total_frames = int(sum(durs) * 24000 / 128 + 0.5)
        assert (mel2ph > 0).sum() == total_frames


@pytest.fixture(scope="module")
def binarized(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    raw = str(root / "raw")
    make_synthetic_corpus(raw, n_items=8, seed=0)
    hp = load_hparams(
        overrides=dict(
            raw_data_dir=raw,
            raw_json_fn="meta.json",
            binary_data_dir=str(root / "binary"),
            num_spk=4,
            test_prefixes=["Alto-1#song0"],
            pitch_extractor="autocorr",
        )
    )
    M4SingerBinarizer(hp).process()
    return hp


class TestBinarizer:
    def test_outputs_exist(self, binarized):
        d = binarized["binary_data_dir"]
        for fn in [
            "phone_set.json",
            "spk_map.json",
            "train.data",
            "train.idx",
            "valid.data",
            "train_lengths.npy",
            "train_f0s_mean_std.npy",
        ]:
            assert os.path.exists(os.path.join(d, fn)), fn

    def test_record_contract(self, binarized):
        r = RecordReader(os.path.join(binarized["binary_data_dir"], "train"))
        assert len(r) > 0
        item = r[0]
        t = item["mel"].shape[0]
        assert item["mel"].shape[1] == 80
        assert item["mel2ph"].shape == (t,)
        assert item["f0"].shape == (t,)
        n_ph = len(item["phone"])
        assert item["pitch_midi"].shape == (n_ph,)
        assert item["lang"].shape == (n_ph,)
        assert item["mel2ph"].max() <= n_ph
        # synthetic corpus is voiced: f0 found somewhere
        assert (item["f0"] > 0).any()

    def test_split_by_prefix(self, binarized):
        test_r = RecordReader(os.path.join(binarized["binary_data_dir"], "test"))
        names = [test_r[i]["item_name"] for i in range(len(test_r))]
        assert all(n.startswith("Alto-1#song0") for n in names)


class TestDataset:
    def test_batching_static_shapes(self, binarized):
        hp = binarized.replace(bucket_tokens=[16, 32], bucket_frames=[128, 256, 512])
        ds = M4SingerDataset(hp, "train", shuffle=True)
        dl = DataLoader(ds, hp, max_tokens=2000, max_sentences=4)
        batches = list(dl)
        assert len(batches) >= 1
        for b in batches:
            assert b["txt_tokens"].shape[1] in (16, 32)
            assert b["mels"].shape[1] in (128, 256, 512)
            assert b["mels"].shape[2] == 80
            assert b["mel2ph"].shape == b["f0"].shape == b["uv"].shape
            assert b["pitch_midi"].shape == b["txt_tokens"].shape
            assert b["speechsing"].shape == (b["txt_tokens"].shape[0],)

    def test_sharding_partitions_batches(self, binarized):
        """Multi-host contract: every shard yields the SAME number of
        batches with IDENTICAL padded shapes (SPMD programs must agree
        across processes); each feeds its disjoint row range, and
        stacking the shards reconstructs the full batch."""
        ds = M4SingerDataset(binarized, "train", shuffle=False)
        dl_all = DataLoader(ds, binarized, shuffle=False, max_sentences=2)
        n_all = len(dl_all)
        shards = [
            list(DataLoader(
                ds, binarized, shuffle=False, max_sentences=2,
                shard_index=i, num_shards=2,
            ))
            for i in range(2)
        ]
        assert len(shards[0]) == len(shards[1]) == n_all
        for b0, b1 in zip(*shards):
            assert b0["txt_tokens"].shape == b1["txt_tokens"].shape
            assert b0["mels"].shape == b1["mels"].shape
            # disjoint row ranges of one global batch
            assert b0["nsamples"] == b1["nsamples"]
            ids = set(np.concatenate([b0["ids"], b1["ids"]]).tolist())
            assert len(ids) >= b0["nsamples"]  # padding may repeat rows

    def test_batch_by_size_budget(self):
        sizes = np.asarray([10, 10, 10, 100, 100])
        batches = batch_by_size(np.arange(5), sizes, max_tokens=200, max_sentences=10)
        for b in batches:
            assert len(b) * sizes[b].max() <= 200

    def test_pick_bucket(self):
        assert pick_bucket(100, [128, 256]) == 128
        assert pick_bucket(128, [128, 256]) == 128
        assert pick_bucket(300, [128, 256]) == 256  # clamps to largest


def test_spk_embed_binarization(tmp_path):
    """with_spk_embed records a 256-d unit-norm speaker vector per item
    (reference base_binarizer.py:145-146; resemblyzer-gated with a
    mel-statistics fallback) and it collates to [B, 256]."""
    import numpy as np

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.data.binarizer import M4SingerBinarizer
    from bisinger_tpu.data.dataset import DataLoader, M4SingerDataset
    from bisinger_tpu.data.synthetic import make_synthetic_corpus

    raw = tmp_path / "raw"
    make_synthetic_corpus(str(raw), n_items=4, seed=0)
    hp = load_hparams(
        overrides=dict(
            raw_data_dir=str(raw),
            raw_json_fn="meta.json",
            binary_data_dir=str(tmp_path / "bin"),
            num_spk=4,
            test_num=1,
            use_spk_id=False,
            use_spk_embed=True,
            binarization_args={"with_f0": True, "with_spk_embed": True},
        )
    )
    M4SingerBinarizer(hp).process()
    ds = M4SingerDataset(hp, "train")
    assert "spk_embed" in ds[0]
    assert ds[0]["spk_embed"].shape == (256,)
    assert abs(np.linalg.norm(ds[0]["spk_embed"]) - 1.0) < 1e-3
    batch = next(iter(DataLoader(ds, hp, shuffle=False)))
    assert batch["spk_embed"].shape[1] == 256


def test_spk_embed_trains(tmp_path):
    """use_spk_embed=true trains end-to-end with the recorded vectors."""
    import jax
    import numpy as np

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.data.binarizer import M4SingerBinarizer
    from bisinger_tpu.data.dataset import DataLoader, M4SingerDataset
    from bisinger_tpu.data.synthetic import make_synthetic_corpus
    from bisinger_tpu.training.tasks import AuxDecoderMIDITask
    from bisinger_tpu.training.trainer import device_batch
    from bisinger_tpu.utils.text_encoder import build_phone_encoder

    raw = tmp_path / "raw"
    make_synthetic_corpus(str(raw), n_items=4, seed=0)
    hp = load_hparams(
        overrides=dict(
            raw_data_dir=str(raw),
            raw_json_fn="meta.json",
            binary_data_dir=str(tmp_path / "bin"),
            hidden_size=32, enc_layers=1, dec_layers=1, num_heads=2,
            enc_ffn_kernel_size=3, dec_ffn_kernel_size=3,
            dur_predictor_layers=2, predictor_layers=2,
            use_pitch_embed=False, num_spk=4, max_words=16,
            bucket_tokens=[32], bucket_frames=[256],
            use_spk_id=False, use_spk_embed=True,
            binarization_args={"with_f0": True, "with_spk_embed": True},
        )
    )
    M4SingerBinarizer(hp).process()
    vocab = build_phone_encoder(hp["binary_data_dir"]).vocab_size
    batch = device_batch(next(iter(DataLoader(M4SingerDataset(hp, "train"), hp))))
    assert "spk_embed" in batch
    task = AuxDecoderMIDITask(hp, vocab)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    state, losses = task.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total_loss"]))


def test_spk_embed_fallback_discriminative():
    """The mel-statistics fallback must distinguish very different
    signals (regression: log-mel centroid degenerated to a constant)."""
    import numpy as np

    from bisinger_tpu.data.binarizer import extract_spk_embed

    sr = 24000
    t = np.arange(sr) / sr
    sine = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    noise = (0.1 * np.random.default_rng(0).standard_normal(sr)).astype(np.float32)
    cos = float(extract_spk_embed(sine, sr) @ extract_spk_embed(noise, sr))
    assert cos < 0.9, cos
