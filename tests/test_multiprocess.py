"""Chunked multiprocess runner (reference utils/multiprocess_utils.py:19-47)."""

import os

from bisinger_tpu.utils.multiprocess import chunked_multiprocess_run


def _square(x):
    return x * x


def _maybe_fail(x):
    if x == 3:
        raise ValueError("boom")
    return x


def test_ordered_results():
    out = list(chunked_multiprocess_run(_square, [(i,) for i in range(20)], num_workers=4))
    assert out == [i * i for i in range(20)]


def test_inline_fallback():
    out = list(chunked_multiprocess_run(_square, [(i,) for i in range(5)], num_workers=1))
    assert out == [0, 1, 4, 9, 16]


def test_worker_error_propagates():
    import pytest

    with pytest.raises((RuntimeError, ValueError), match="boom|item"):
        list(chunked_multiprocess_run(_maybe_fail, [(i,) for i in range(6)], num_workers=3))


def test_binarizer_parallel(tmp_path, monkeypatch):
    """Binarize the synthetic corpus with N_PROC=4 and get identical shard
    contents to the serial run."""
    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.data.binarizer import M4SingerBinarizer
    from bisinger_tpu.data.records import RecordReader
    from bisinger_tpu.data.synthetic import make_synthetic_corpus

    raw = tmp_path / "raw"
    make_synthetic_corpus(str(raw), n_items=6, seed=0)

    outs = {}
    for tag, n_proc in [("serial", "1"), ("par", "4")]:
        monkeypatch.setenv("N_PROC", n_proc)
        hp = load_hparams(
            overrides=dict(
                raw_data_dir=str(raw),
                raw_json_fn="meta.json",
                binary_data_dir=str(tmp_path / f"bin_{tag}"),
                num_spk=4,
                test_num=1,
            )
        )
        M4SingerBinarizer(hp).process()
        reader = RecordReader(str(tmp_path / f"bin_{tag}" / "train"))
        outs[tag] = [reader[i] for i in range(len(reader))]
    assert len(outs["serial"]) == len(outs["par"]) >= 4
    for a, b in zip(outs["serial"], outs["par"]):
        assert a["item_name"] == b["item_name"]
        import numpy as np

        assert np.allclose(a["mel"], b["mel"])
