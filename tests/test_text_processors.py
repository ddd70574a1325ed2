"""Txt processors + ZH NSW normalization (reference
`data_gen/tts/txt_processors/`, `utils/text_norm.py`)."""

from bisinger_tpu.data.text.processors import (
    EnTxtProcessor,
    ZhTxtProcessor,
    english_number_reading,
    get_txt_processor_cls,
)
from bisinger_tpu.data.text.text_norm import (
    NSWNormalizer,
    cardinal_reading,
    decimal_reading,
    digit_reading,
    normalize_chinese,
)


def test_registry():
    assert get_txt_processor_cls("en") is EnTxtProcessor
    assert get_txt_processor_cls("zh") is ZhTxtProcessor
    assert get_txt_processor_cls("zh_g2pM") is ZhTxtProcessor


def test_cardinal_reading():
    assert cardinal_reading("0") == "零"
    assert cardinal_reading("10") == "十"
    assert cardinal_reading("14") == "十四"
    assert cardinal_reading("2024") == "二千零二十四"
    assert cardinal_reading("10203") == "一万零二百零三"
    assert cardinal_reading("100000000") == "一亿"


def test_digit_and_decimal():
    assert digit_reading("2024") == "二零二四"
    assert digit_reading("13911112222", telephone=True) == "幺三九幺幺幺幺二二二二"
    assert decimal_reading("3.14") == "三点一四"


def test_nsw_normalizer():
    assert NSWNormalizer("2024年").normalize() == "二零二四年"
    assert NSWNormalizer("涨了5%").normalize() == "涨了百分之五"
    assert NSWNormalizer("3/4拍").normalize() == "四分之三拍"
    assert NSWNormalizer("共15人").normalize() == "共十五人"
    assert "点" in normalize_chinese("3.5倍")


def test_english_numbers():
    assert english_number_reading(0) == "zero"
    assert english_number_reading(21) == "twenty one"
    assert english_number_reading(105) == "one hundred five"
    assert english_number_reading(3000) == "three thousand"


def test_en_processor():
    phs, txt = EnTxtProcessor.process("I love you 2")
    assert txt == "i love you two"
    assert phs.count("|") == 3
    assert "AY" in phs and "L" in phs


def test_zh_processor_pinyin_path():
    phs = ZhTxtProcessor.process_pinyin(["ni", "hao"])
    # n i | h ao with word-end marks
    assert phs[0] == "N" or phs[0] == "n"
    assert "|" in phs and "#" in phs


def test_zh_processor_hanzi_gated():
    import pytest

    try:
        import pypinyin  # noqa: F401

        phs, txt = ZhTxtProcessor.process("你好123")
        assert txt == "你好一百二十三"
    except ImportError:
        with pytest.raises(RuntimeError, match="pypinyin"):
            ZhTxtProcessor.process("你好")


def test_nsw_reference_conformance():
    """Run OUR normalizer and the REFERENCE's own text_norm.py over an
    NSW corpus and require identical outputs (VERDICT round-1 item 10).
    Deliberate divergence (documented in text_norm.py): fullwidth ASCII
    digits are halfwidth-normalized here but left alone by the
    reference, so the corpus sticks to halfwidth digits."""
    import importlib.util
    import os

    ref_path = "/root/reference/train_bisinger/utils/text_norm.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference checkout unavailable")
    spec = importlib.util.spec_from_file_location("ref_text_norm", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    corpus = [
        # the reference's own nsw_test battery (`text_norm.py:723-738`)
        "固话：0595-23865596或23880880。",
        "手机：+86 19859213959或15659451527。",
        "分数：32477/76391。",
        "百分数：80.03%。",
        "编号：31520181154418。",
        "纯数：2983.07克或12345.60米。",
        "日期：1999年2月20日或09年3月15号。",
        "金钱：12块5，34.5元，20.1万",
        "特殊：O2O或B2C。",
        "3456万吨", "2938个", "938",
        "今天吃了115个小笼包231个馒头",
        "有62％的概率",
        # cardinals incl. the 两-substitution and 零 runs
        "我有2个苹果", "他跑了100米", "共15人", "第10名", "25岁",
        "两条船2艘", "价格是1200元", "全长20202米высота", "一共9888元",
        "20.5", "0.25", "102", "12", "200002", "1020304050",
        # dates / phones / ids
        "2024年", "5月1日", "98年5月", "1998年12月31日",
        "房间号1203", "电话13912345678", "编号0101",
        # fractions / percents / ranges-in-text
        "3/4拍", "涨了5%", "降了0.5%", "占7/10",
        # mixed CN/EN lyric-like lines
        "我爱你2000年不变", "sing一首歌给你听123",
    ]
    diffs = []
    for s in corpus:
        ours = normalize_chinese(s)
        theirs = ref.NSWNormalizer(s).normalize()
        if ours != theirs:
            diffs.append(f"  {s!r}:\n    ours:   {ours!r}\n    theirs: {theirs!r}")
    assert not diffs, "NSW divergences vs reference:\n" + "\n".join(diffs)


def test_syllable_mapping_reference_conformance():
    """mode='ref' vs the reference's own get_syllable_cmuph_mapping /
    get_cmuph_for_consonan (`a-m4-detect.py:65-137`). The reference file
    is not importable (spacy loads at module scope), so the two pure
    functions are extracted by AST and exec'd."""
    import ast
    import os

    ref_file = os.environ.get(
        "BISINGER_REF", "/root/reference/train_bisinger"
    ) + "/inference/m4singer/bisinger/a-m4-detect.py"
    if not os.path.exists(ref_file):
        import pytest

        pytest.skip("reference checkout unavailable")

    from bisinger_tpu.data.text.english import map_syllables_to_phones

    tree = ast.parse(open(ref_file).read())
    ns = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in (
            "get_syllable_cmuph_mapping",
            "get_cmuph_for_consonan",
        ):
            mod = ast.Module(body=[node], type_ignores=[])
            exec(compile(mod, ref_file, "exec"), ns)
    ref_fn = ns["get_syllable_cmuph_mapping"]

    cases = [
        # fixed-word overrides (incl. single-syllable "enough"/"lovers")
        (["enough"], ["IH", "N", "AH", "F"]),
        (["lovers"], ["L", "AH", "V", "ER", "Z"]),
        (["for", "ev", "er"], ["F", "ER", "EH", "V", "ER"]),
        # respelled pairs feeding the consonant walk
        (["fam", "i", "ly"], ["F", "AE", "M", "AH", "L", "IY"]),
        (["nev", "er"], ["N", "EH", "V", "ER"]),
        (["ev", "er"], ["EH", "V", "ER"]),
        (["voic", "es"], ["V", "OY", "S", "IH", "Z"]),
        # generic onset-boundary walks
        (["ta", "ble"], ["T", "EY", "B", "AH", "L"]),
        (["cir", "cle"], ["S", "ER", "K", "AH", "L"]),
        (["with", "in"], ["W", "IH", "DH", "IH", "N"]),
        (["ship", "ping"], ["SH", "IH", "P", "IH", "NG"]),
        # single syllable, no override
        (["dog"], ["D", "AO", "G"]),
    ]
    for syls, phones in cases:
        ours = map_syllables_to_phones(list(syls), list(phones), mode="ref")
        theirs = ref_fn(list(syls), list(phones))  # mutates syllable_lst
        assert ours == theirs, (syls, phones, ours, theirs)

    # walks that never find the next onset (e.g. a vowel-initial second
    # syllable: onset('er') is the single letter 'E', matching no CMU
    # phone): the reference IndexErrors; mode='ref' falls back to the
    # robust partition instead
    import pytest

    for bad in [
        (["sing", "er"], ["S", "IH", "NG", "ER"]),
        (["xx", "qq"], ["AH", "AH"]),
    ]:
        with pytest.raises(IndexError):
            ref_fn(list(bad[0]), list(bad[1]))
        out = map_syllables_to_phones(list(bad[0]), list(bad[1]), mode="ref")
        assert sum(out, []) == bad[1] and len(out) == 2
