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
