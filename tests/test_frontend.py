import numpy as np
import pytest

from bisinger_tpu.data.text.english import (
    EnglishLexicon,
    g2p_fallback,
    map_syllables_to_phones,
    syllabify,
)
from bisinger_tpu.data.text.frontend import (
    BilingualFrontend,
    beats_to_seconds,
    contains_chinese,
    note_to_midi,
)
from bisinger_tpu.data.text.pinyin import (
    all_pinyin_syllables,
    pinyin_to_cmu,
    split_pinyin,
)
from bisinger_tpu.utils.text_encoder import TokenTextEncoder


class TestPinyin:
    def test_split(self):
        assert split_pinyin("zhang") == ("zh", "ang")
        assert split_pinyin("an") == (None, "an")
        assert split_pinyin("wo3") == ("w", "o")
        assert split_pinyin("shi") == ("sh", "i")

    def test_mapping_matches_bisinger_convention(self):
        # values from the reference assets/pinyin_cmu_map.txt
        assert pinyin_to_cmu("a") == ["AA"]
        assert pinyin_to_cmu("ang") == ["AE", "NG"]
        assert pinyin_to_cmu("ci") == ["T", "S", "IY"]
        assert pinyin_to_cmu("zhang") == ["JH", "AE", "NG"]
        assert pinyin_to_cmu("xin") == ["X", "IY", "N"]
        assert pinyin_to_cmu("qu") == ["Q", "IY", "UW"]  # ü after q
        assert pinyin_to_cmu("lv") == ["L", "IY", "UW"]

    def test_all_enumerable(self):
        syls = all_pinyin_syllables()
        assert "zhang" in syls and "a" in syls
        for s in ["wo", "xi", "huan", "ni", "ma", "hao"]:
            assert pinyin_to_cmu(s)


class TestEnglish:
    def test_lexicon_and_fallback(self):
        lex = EnglishLexicon()
        assert lex.lookup("circle") == ["S", "ER", "K", "AH", "L"]
        oov = lex.lookup("zorbly")
        assert len(oov) > 0  # g2p fallback produced something

    def test_g2p_digraphs(self):
        assert "CH" in g2p_fallback("church")
        assert "SH" in g2p_fallback("shine")
        assert "NG" in g2p_fallback("song")

    def test_syllabify(self):
        assert syllabify("long") == ["long"]
        assert syllabify("superstar") == ["su", "per", "star"]
        assert len(syllabify("terribly")) == 3

    def test_map_syllables_to_phones(self):
        mapping = map_syllables_to_phones(
            ["su", "per", "star"], ["S", "UW", "P", "ER", "S", "T", "AA", "R"]
        )
        assert len(mapping) == 3
        assert [p for chunk in mapping for p in chunk] == [
            "S", "UW", "P", "ER", "S", "T", "AA", "R",
        ]
        # each chunk has at least one phone and one vowel nucleus
        for chunk in mapping:
            assert chunk

    def test_map_single(self):
        assert map_syllables_to_phones(["oh"], ["OW"]) == [["OW"]]


class TestScoreUtils:
    def test_note_to_midi(self):
        assert note_to_midi("C4") == 60
        assert note_to_midi("A4") == 69
        assert note_to_midi("A#3") == 58
        assert note_to_midi("Bb3") == 58
        assert note_to_midi("D4/C4") == 62  # slash takes first
        assert note_to_midi("rest") == 0

    def test_beats_to_seconds(self):
        out = beats_to_seconds(120, "0.5 | 1")
        words = out.split("|")
        assert float(words[0]) == pytest.approx(1.0)  # 0.5*4 beats at 0.5s
        assert float(words[1]) == pytest.approx(2.0)

    def test_contains_chinese(self):
        assert contains_chinese("我喜欢")
        assert not contains_chinese("hello")


def make_frontend():
    phones = sorted(
        set(
            ["<SP>", "<AP>"]
            + [p for s in ["wo", "xi", "huan", "ni"] for p in pinyin_to_cmu(s)]
            + ["S", "ER", "K", "AH", "L", "DH", "T", "IH", "Z", "OW", "AY", "V",
               "F", "L", "AY", "EH", "UW", "AA", "R", "P", "B", "IY", "M", "EY"]
        )
    )
    enc = TokenTextEncoder(vocab_list=phones, replace_oov=",")
    return BilingualFrontend(enc), enc


class TestBilingualFrontend:
    def test_mixed_input(self):
        fe, enc = make_frontend()
        inp = {
            "text": "SP wo xi huan ni circle",
            "notes": "rest | C4 | D4 | E4 | F4 | G4 A4",
            "notes_duration": "0.2 | 0.3 | 0.3 | 0.3 | 0.3 | 0.2 0.3",
        }
        item = fe(inp)
        n = len(item["ph_token"])
        assert n > 6
        assert item["pitch_midi"].shape == (n,)
        assert item["midi_dur"].shape == (n,)
        assert item["is_slur"].shape == (n,)
        assert item["lang"].shape == (n,)
        # SP is Chinese-tagged (reference convention), circle English
        assert item["lang"][0] == 1
        assert item["lang"][-1] == 0
        assert item["speechsing"] == 1

    def test_cn_slur_expansion(self):
        fe, enc = make_frontend()
        # two notes on one CN word: yunmu repeated with slur
        inp = {
            "text": "wo",
            "notes": "C4 D4",
            "notes_duration": "0.3 0.2",
        }
        item = fe(inp)
        phs = item["ph"].split()
        # 'wo' -> W AO; slur adds AO again
        assert phs == ["W", "AO", "AO"]
        assert item["is_slur"].tolist() == [0, 0, 1]
        assert item["pitch_midi"].tolist() == [60, 60, 62]

    def test_en_melisma(self):
        fe, enc = make_frontend()
        inp = {
            "text": "oooh",
            "notes": "C4 D4 E4",
            "notes_duration": "0.2 0.2 0.2",
        }
        item = fe(inp)
        phs = item["ph"].split()
        assert phs == ["UW", "UW", "UW"]
        assert item["is_slur"].tolist() == [0, 1, 1]

    def test_word_notes_mismatch_raises(self):
        fe, enc = make_frontend()
        with pytest.raises(ValueError):
            fe({"text": "wo ni", "notes": "C4", "notes_duration": "0.3"})

    def test_bpm_conversion(self):
        fe, enc = make_frontend()
        inp = {
            "text": "wo",
            "notes": "C4",
            "notes_duration": "0.25",
            "bpm": 120,
        }
        item = fe(inp)
        assert item["midi_dur"][0] == pytest.approx(0.5)


class TestMelisma:
    """CN slur tails repeat the YUNMU (not phones[1:]) and EN words with
    more syllables than notes keep every phone."""

    def _fe(self):
        enc = TokenTextEncoder(
            ["AY", "AE", "N", "T", "S", "B", "IY", "UW", "AH", "F", "L",
             "JH", "AA", "NG", "Y", "<AP>", "<SP>"]
        )
        return BilingualFrontend(enc)

    def test_zero_initial_melisma_keeps_note(self):
        # 'ai' -> [AY]: phones[1:] would be empty and the melisma note
        # would vanish; the yunmu is the whole phone list
        r = self._fe().preprocess_word_level(
            dict(text="ai", notes="C4 D4", notes_duration="0.3 0.3")
        )
        assert r["ph_seq"].split() == ["AY", "AY"]
        assert r["is_slur"] == [0, 1]
        assert r["note_lst"] == ["C4", "D4"]

    def test_multi_phone_initial_not_leaked_into_slur(self):
        # 'cai' -> [T, S, AY]: the slur tail must repeat only the yunmu
        # AY, not the initial's S
        r = self._fe().preprocess_word_level(
            dict(text="cai", notes="C4 D4", notes_duration="0.3 0.3")
        )
        assert r["ph_seq"].split() == ["T", "S", "AY", "AY"]
        assert r["is_slur"] == [0, 0, 0, 1]

    def test_full_yunmu_repeats(self):
        # 'zhang' -> [JH, AA, NG]: slur tail = AA NG (yunmu), initial JH
        # excluded
        r = self._fe().preprocess_word_level(
            dict(text="zhang", notes="C4 D4", notes_duration="0.3 0.3")
        )
        phones = r["ph_seq"].split()
        assert phones[:3] == ["JH", "AE", "NG"]
        assert phones[3:] == ["AE", "NG"]
        assert r["is_slur"] == [0, 0, 0, 1, 1]

    def test_en_more_syllables_than_notes_keeps_phones(self):
        # 'beautiful' (3 syllables) over 2 notes: every phone survives
        # (surplus syllables merge onto the last note)
        fe = self._fe()
        lex_phones = fe.lexicon.lookup("beautiful")
        r = fe.preprocess_word_level(
            dict(text="beautiful", notes="C4 D4", notes_duration="0.3 0.3")
        )
        assert r["ph_seq"].split() == lex_phones
        assert r["total_sec"] == pytest.approx(0.6)

    def test_total_sec_counts_each_note_once(self):
        r = self._fe().preprocess_word_level(
            dict(text="zhang ai", notes="C4 D4 | E4",
                 notes_duration="0.3 0.2 | 0.4")
        )
        assert r["total_sec"] == pytest.approx(0.9)
        # while the per-phone list repeats durs per phone
        assert sum(float(d) for d in r["midi_dur_lst"]) > 0.9
