"""Corpus-adaptation tools (reference utils/get_meta_m4_avg.py,
merge_jsons.py, pitch_shift.py)."""

import json

import pytest

from bisinger_tpu.tools.merge import merge_meta_jsons, speechsing_tag
from bisinger_tpu.tools.meta import convert_m4_item, slur_runs
from bisinger_tpu.tools.pitch_shift import (
    CHORDS,
    chord_f0_per_window,
    freq_to_midi,
    group_notes,
    note_to_freq,
    shift_item_meta,
)


def _m4_item():
    # wo(w o) de(d e) with a slur continuation on the second syllable
    return {
        "item_name": "Alto-1#song#0000",
        "txt": "我的",
        "phs": ["<SP>", "w", "o", "d", "e", "e", "<SP>"],
        "ph_dur": [0.1, 0.1, 0.3, 0.1, 0.3, 0.2, 0.1],
        "notes": [0, 60, 60, 62, 62, 64, 0],
        "notes_dur": [0.1, 0.4, 0.4, 0.4, 0.4, 0.2, 0.1],
        "is_slur": [0, 0, 0, 0, 0, 1, 0],
    }


def test_slur_runs():
    assert slur_runs([0, 0, 1, 1, 0]) == [[0], [1, 2, 3], [4]]


def test_convert_m4_item():
    out = convert_m4_item(_m4_item())
    assert out["lang"] == 1
    n = len(out["phs"])
    assert (
        n == len(out["is_slur"]) == len(out["ph_dur"]) == len(out["notes"])
        == len(out["notes_dur"]) == len(out["word_boundary"])
    )
    # 'o' -> AO (1 phone), 'e' -> ER; total phone count grows only via
    # multi-phone finals; durations were split evenly per source phone
    assert abs(sum(out["ph_dur"]) - sum(_m4_item()["ph_dur"])) < 1e-2
    # slur run (e, e-slur) forms ONE word: exactly one boundary over it
    assert out["word_boundary"][-1] == 1  # final phone always ends a word


def test_speechsing_tags():
    assert speechsing_tag("db4#cn#001") == 0
    assert speechsing_tag("db4#cn-shift#001") == 2
    assert speechsing_tag("Alto-1#song#001") == 1


def test_merge(tmp_path):
    a, b = tmp_path / "a.json", tmp_path / "b.json"
    a.write_text(json.dumps({"item_name": "db4#cn#1"}) + "\n")
    b.write_text(json.dumps({"item_name": "Alto-1#s#1"}) + "\n")
    out = tmp_path / "out.json"
    assert merge_meta_jsons([str(a), str(b)], str(out)) == 2
    items = [json.loads(l) for l in out.read_text().splitlines()]
    assert items[0]["speechsing"] == 0 and items[1]["speechsing"] == 1


def test_note_freq_midi():
    assert abs(note_to_freq("A4") - 440.0) < 0.5
    assert freq_to_midi(440.0) == 69
    assert freq_to_midi(note_to_freq("C4")) == 60
    for chord in CHORDS:
        assert all(f > 0 for f in chord)


def test_group_notes():
    item = _m4_item()
    unique_dur, rep_count, sp = group_notes(item["notes"], item["notes_dur"], item["ph_dur"])
    assert sum(rep_count) == len(item["notes"])
    assert sp[0] == 1 and sp[-1] == 1  # SP windows
    assert len(unique_dur) == len(rep_count) == len(sp)


def test_chord_assignment_skips_sp():
    f0 = chord_f0_per_window([0.1, 0.4, 0.4, 0.1], [1, 0, 0, 1], [100.0, 200.0])
    assert f0 == [0.0, 100.0, 200.0, 0.0]


def test_shift_item_meta():
    item = {**_m4_item(), "item_name": "db4#cn#0001"}
    out, unique_dur, new_f0 = shift_item_meta(item, chord=CHORDS[0])
    assert out["item_name"] == "db4#cn-shift#0001"
    assert len(out["notes"]) == len(item["notes"])
    assert out["notes"][0] == 0  # SP stays unvoiced
    assert all(n > 0 for n in out["notes"][1:-1])


def test_shift_audio_gated():
    from bisinger_tpu.tools.pitch_shift import shift_item_audio
    import numpy as np

    try:
        import pyworld  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="pyworld"):
            shift_item_audio(np.zeros(2400, np.float32), 24000, [0.1], [220.0])


def test_mfa_prep(tmp_path):
    """wav/lab pairing for MFA (reference get_pairs_db4.sh)."""
    import os

    import numpy as np

    from bisinger_tpu.tools.mfa_prep import load_transcripts, prepare_corpus
    from bisinger_tpu.utils.audio import save_wav

    wavs = tmp_path / "wavs"
    wavs.mkdir()
    for utt in ("a1", "a2"):
        save_wav(np.zeros(2400, np.float32), str(wavs / f"{utt}.wav"), 24000)
    tr = tmp_path / "tr.txt"
    tr.write_text("a1\tni hao\na2\thello world\nmissing\tx\n")
    out = tmp_path / "corpus"
    n = prepare_corpus(str(wavs), load_transcripts(str(tr)), str(out), "spkA")
    assert n == 2
    assert (out / "spkA" / "a1.lab").read_text().strip() == "ni hao"
    assert os.path.exists(out / "spkA" / "a2.wav")


def test_adjust_item_durations():
    """TextGrid duration reconciliation (reference adjust_m4_ori_meta)."""
    from bisinger_tpu.tools.meta import adjust_item_durations

    tg = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 3
        intervals [1]:
            xmin = 0.0
            xmax = 0.25
            text = ""
        intervals [2]:
            xmin = 0.25
            xmax = 0.65
            text = "n"
        intervals [3]:
            xmin = 0.65
            xmax = 1.0
            text = "i"
"""
    item = {"item_name": "a#b#1", "phs": ["<SP>", "n", "i"], "ph_dur": [0.1, 0.5, 0.4]}
    out = adjust_item_durations(item, tg)
    assert out["ph_dur"] == [0.25, 0.4, 0.35]
    # count mismatch -> unchanged
    bad = {"item_name": "a#b#2", "phs": ["n"], "ph_dur": [1.0]}
    assert adjust_item_durations(bad, tg)["ph_dur"] == [1.0]


def test_adjust_inserts_and_merges_silences():
    """Silence-aware reconciliation (reference adjust_m4_ori_meta):
    a TextGrid silence the item lacks is INSERTED as <SP>/rest; an item
    silence MFA merged away is dropped."""
    from bisinger_tpu.tools.meta import adjust_item_durations

    def tg_for(intervals):
        rows = []
        for i, (a, b, t) in enumerate(intervals):
            rows.append(
                f"        intervals [{i+1}]:\n            xmin = {a}\n"
                f"            xmax = {b}\n            text = \"{t}\""
            )
        body = "\n".join(rows)
        return f'''File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = {len(intervals)}
{body}
'''

    # TextGrid has a LEADING silence the item lacks -> inserted <SP>
    tg = tg_for([(0.0, 0.2, ""), (0.2, 0.6, "n"), (0.6, 1.0, "i")])
    item = {
        "item_name": "a#b#1", "phs": ["n", "i"], "ph_dur": [0.5, 0.5],
        "notes": ["C4", "D4"], "notes_dur": [0.5, 0.5], "is_slur": [0, 0],
    }
    out = adjust_item_durations(item, tg)
    assert out["phs"] == ["<SP>", "n", "i"]
    assert out["notes"] == ["rest", "C4", "D4"]
    assert out["ph_dur"] == [0.2, 0.4, 0.4]
    assert out["is_slur"] == [0, 0, 0]

    # item has a TRAILING <SP> that MFA merged away -> dropped
    tg2 = tg_for([(0.0, 0.5, "n"), (0.5, 1.0, "i")])
    item2 = {
        "item_name": "a#b#2", "phs": ["n", "i", "<SP>"],
        "ph_dur": [0.4, 0.4, 0.2], "notes": ["C4", "D4", "rest"],
        "notes_dur": [0.4, 0.4, 0.2], "is_slur": [0, 0, 0],
    }
    out2 = adjust_item_durations(item2, tg2)
    assert out2["phs"] == ["n", "i"]
    assert out2["ph_dur"] == [0.5, 0.5]

    # irreconcilable speech phones -> unchanged
    tg3 = tg_for([(0.0, 1.0, "n")])
    item3 = {"item_name": "a#b#3", "phs": ["n", "i"], "ph_dur": [0.5, 0.5]}
    assert adjust_item_durations(item3, tg3)["ph_dur"] == [0.5, 0.5]
