"""MFA-proportional meta split (reference `utils/get_meta_m4_proportional.py`).

Expected rows are hand-computed by the reference's arithmetic (split_time
4-decimal rounding, locate_idx_percent_note boundary splitting) so the
generalized n-segment implementation is pinned to the reference's cases."""

import json
import os

import pytest

from bisinger_tpu.tools.proportional import (
    align_words,
    convert_item_proportional,
    locate_boundary,
    pipeline,
    split_final_rows,
    split_time,
)


def _tg(tiers):
    """tiers: [(name, [(xmin, xmax, text), ...]), ...] -> long TextGrid."""
    xmax = max(iv[1] for _, ivs in tiers for iv in ivs)
    out = [
        'File type = "ooTextFile"',
        'Object class = "TextGrid"',
        "",
        "xmin = 0",
        f"xmax = {xmax}",
        "tiers? <exists>",
        f"size = {len(tiers)}",
        "item []:",
    ]
    for i, (name, ivs) in enumerate(tiers):
        out += [
            f"    item [{i + 1}]:",
            '        class = "IntervalTier"',
            f'        name = "{name}"',
            "        xmin = 0",
            f"        xmax = {xmax}",
            f"        intervals: size = {len(ivs)}",
        ]
        for j, (a, b, t) in enumerate(ivs):
            out += [
                f"        intervals [{j + 1}]:",
                f"            xmin = {a}",
                f"            xmax = {b}",
                f'            text = "{t}"',
            ]
    return "\n".join(out) + "\n"


def test_split_time_rounding():
    out = split_time([0.4, 0.3], 0.6)
    assert out == [0.3429, 0.2571]
    assert round(sum(out), 4) == 0.6


def test_locate_boundary():
    idx, pct = locate_boundary(0.3429, [0.4, 0.2])
    assert idx == 0
    assert abs(pct - 0.85725) < 1e-6
    idx, pct = locate_boundary(0.5, [0.4, 0.2])
    assert idx == 1 and abs(pct - 0.5) < 1e-6


def test_split_final_two_cmu_over_slur():
    # final 'an' -> [AE, N], 0.6 s over slurred notes [62 (0.4), 64 (0.2)],
    # MFA gave AE/N 0.4/0.3 -> proportional targets 0.3429/0.2571
    rows = split_final_rows(
        ["AE", "N"], [0.3429, 0.2571], [0.4, 0.2], [62, 64], [0.4, 0.2]
    )
    assert [r[0] for r in rows] == ["AE", "N", "N"]
    assert [r[1] for r in rows] == [0.3429, 0.0571, 0.2]
    assert [r[2] for r in rows] == [62, 62, 64]
    assert [r[4] for r in rows] == [0, 0, 1]  # slur continuation on 2nd N
    assert round(sum(r[1] for r in rows), 4) == 0.6


def test_split_final_single_note_and_single_cmu():
    # no slur: targets pass through
    rows = split_final_rows(["IY", "NG"], [0.1, 0.2], [0.3], [60], [0.3])
    assert [(r[0], r[1], r[2]) for r in rows] == [("IY", 0.1, 60), ("NG", 0.2, 60)]
    # one CMU phone over 3 slurred notes keeps per-note durations
    rows = split_final_rows(["IY"], [0.6], [0.1, 0.3, 0.2], [60, 62, 64], [0.1, 0.3, 0.2])
    assert [r[1] for r in rows] == [0.1, 0.3, 0.2]
    assert [r[4] for r in rows] == [0, 1, 1]


def test_align_words():
    m4 = ["<AP>", "ni", "<SP>", "hao", "<SP>"]
    mfa = ["", "ni", "hao", ""]
    assert align_words(m4, mfa) == [None, 1, None, 2, None]
    with pytest.raises(ValueError):
        align_words(["a", "b"], ["a"])


def _case():
    # <AP>(0.1) + "han": h 0.2, an slurred over notes 62/64 (0.4+0.2)
    m4_tg = _tg(
        [
            ("words", [(0.0, 0.1, "<AP>"), (0.1, 0.9, "han")]),
            (
                "phones",
                [(0.0, 0.1, "<AP>"), (0.1, 0.3, "h"), (0.3, 0.9, "an")],
            ),
        ]
    )
    mfa_tg = _tg(
        [
            ("words", [(0.0, 0.1, ""), (0.1, 0.9, "han")]),
            (
                "phones",
                [
                    (0.0, 0.1, ""),
                    (0.1, 0.2, "HH"),
                    (0.2, 0.6, "AE"),
                    (0.6, 0.9, "N"),
                ],
            ),
        ]
    )
    item = {
        "item_name": "S#song#0000",
        "txt": "含",
        "phs": ["<AP>", "h", "an", "an"],
        "ph_dur": [0.1, 0.2, 0.4, 0.2],
        "notes": [0, 60, 62, 64],
        "notes_dur": [0.1, 0.2, 0.4, 0.2],
        "is_slur": [0, 0, 0, 1],
    }
    return item, m4_tg, mfa_tg


def test_convert_item_proportional():
    item, m4_tg, mfa_tg = _case()
    out = convert_item_proportional(item, m4_tg, mfa_tg)
    assert out["phs"] == ["<AP>", "HH", "AE", "N", "N"]
    assert out["ph_dur"] == [0.1, 0.2, 0.3429, 0.0571, 0.2]
    assert out["notes"] == [0, 60, 62, 62, 64]
    assert out["is_slur"] == [0, 0, 0, 0, 1]
    # sentence-initial silence is not a boundary; the word end is
    assert out["word_boundary"] == [0, 0, 0, 0, 1]
    assert out["words"] == "han"
    assert round(sum(out["ph_dur"]), 4) == round(sum(item["ph_dur"]), 4)


def test_pipeline_layout(tmp_path):
    item, m4_tg, mfa_tg = _case()
    os.makedirs(tmp_path / "m4" / "S#song")
    os.makedirs(tmp_path / "mfa" / "S")
    (tmp_path / "m4" / "S#song" / "0000.TextGrid").write_text(m4_tg)
    (tmp_path / "mfa" / "S" / "song#0000.TextGrid").write_text(mfa_tg)
    meta = tmp_path / "meta.json"
    meta.write_text(json.dumps(item, ensure_ascii=False) + "\n")
    out_fn = tmp_path / "out.json"
    ok, failed = pipeline(
        str(meta), str(out_fn), str(tmp_path / "m4"), str(tmp_path / "mfa")
    )
    assert (ok, failed) == (1, 0)
    row = json.loads(out_fn.read_text().strip())
    assert row["phs"][:2] == ["<AP>", "HH"] and row["lang"] == 1
