"""Native C++ record codec vs the Python decoder."""

import numpy as np
import pytest

from bisinger_tpu.data.records import RecordReader, RecordWriter

native = pytest.importorskip("bisinger_tpu.native")


@pytest.fixture(scope="module")
def shard(tmp_path_factory):
    prefix = str(tmp_path_factory.mktemp("shard") / "train")
    rng = np.random.default_rng(0)
    items = []
    with RecordWriter(prefix) as w:
        for i in range(25):
            item = {
                "item_name": f"it{i:03d}",
                "mel": rng.standard_normal((50 + i, 80)).astype(np.float32),
                "phone": rng.integers(0, 60, size=20 + i).astype(np.int64),
                "f0": rng.random(50 + i).astype(np.float32),
                "spk_id": int(i % 4),
                "loudness": float(i) * 0.5,
                "maybe": None,
                "raw": b"\x00\x01bytes",
            }
            items.append(item)
            w.add_item(item)
    return prefix, items


def test_library_builds():
    assert native.load_library() is not None


def test_native_matches_python(shard):
    prefix, items = shard
    r = native.open_shard(prefix)
    assert r is not None
    assert len(r) == len(items)
    for i in (0, 7, 24):
        got = r[i]
        ref = items[i]
        assert got["item_name"] == ref["item_name"]
        assert got["spk_id"] == ref["spk_id"]
        assert got["loudness"] == ref["loudness"]
        assert got["maybe"] is None
        assert got["raw"] == ref["raw"]
        np.testing.assert_array_equal(got["mel"], ref["mel"])
        np.testing.assert_array_equal(got["phone"], ref["phone"])
    r.close()


def test_reader_auto_backend(shard):
    prefix, items = shard
    reader = RecordReader(prefix, backend="native")
    np.testing.assert_array_equal(reader[3]["mel"], items[3]["mel"])
    reader_py = RecordReader(prefix, backend="python")
    np.testing.assert_array_equal(reader_py[3]["mel"], items[3]["mel"])


def test_corrupt_record_raises(tmp_path):
    prefix = str(tmp_path / "bad")
    with RecordWriter(prefix) as w:
        w.add_item({"x": 1})
    # stomp the magic
    with open(prefix + ".data", "r+b") as f:
        f.write(b"XXXX")
    r = native.open_shard(prefix)
    with pytest.raises(IOError):
        r[0]


def test_empty_shard_opens(tmp_path):
    """A split with zero items is a valid shard: the reader must open it
    (np.memmap refuses empty files) and report len 0."""
    prefix = str(tmp_path / "empty")
    with RecordWriter(prefix):
        pass
    r = RecordReader(prefix)
    assert len(r) == 0


def test_field_cap_enforced_at_write(tmp_path):
    """The 64-field format cap the native reader assumes is enforced at
    write time, not discovered as an IOError at read time."""
    from bisinger_tpu.data.records import encode_record

    with pytest.raises(ValueError, match="64"):
        encode_record({f"k{i}": i for i in range(65)})


def test_oversized_length_rejected(tmp_path):
    """Corrupt records with near-2^64 array lengths must be rejected by
    the bounds check, not wrap the pointer into an out-of-bounds read."""
    import struct

    from bisinger_tpu.data.records import encode_record

    prefix = str(tmp_path / "bad")
    with RecordWriter(prefix) as w:
        w.add_item({"x": np.zeros(4, np.float32)})
    data = bytearray(open(prefix + ".data", "rb").read())
    # find the 8-byte little-endian nbytes field (value 16) and poison it
    pos = data.find(struct.pack("<Q", 16))
    assert pos > 0
    data[pos : pos + 8] = struct.pack("<Q", 2**64 - 8)
    open(prefix + ".data", "wb").write(bytes(data))
    r = RecordReader(prefix, backend="native")
    with pytest.raises((IOError, AssertionError, ValueError)):
        _ = r[0]
