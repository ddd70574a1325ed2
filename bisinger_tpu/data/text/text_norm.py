"""Chinese non-standard-word (NSW) text normalization.

Behavioural equivalent of the reference's `train_bisinger/utils/text_norm.py`
(795 LoC, the standard NSW normalizer used by the ZH txt processors at
`data_gen/tts/txt_processors/zh*.py`): rewrites digits, cardinals, decimals,
percentages, fractions, date/phone-like digit strings and fullwidth ASCII
into spoken hanzi so that downstream g2p only ever sees readable text.

Self-contained (no external deps); pure host-side preprocessing.
"""

from __future__ import annotations

import re

_DIGITS = "零一二三四五六七八九"
_UNITS_SMALL = ["", "十", "百", "千"]
_UNITS_BIG = ["", "万", "亿", "万亿"]


def digit_reading(s: str, telephone: bool = False) -> str:
    """Read a digit string digit-by-digit ('2024' -> '二零二四').
    In telephone mode '1' is read 幺, the standard spoken form."""
    out = []
    for ch in s:
        if ch == "1" and telephone:
            out.append("幺")
        else:
            out.append(_DIGITS[int(ch)])
    return "".join(out)


def _four_digit_reading(s: str) -> str:
    """Read one <=4-digit group, no big unit ('2024' -> '二千零二十四')."""
    n = int(s)
    if n == 0:
        return _DIGITS[0]
    out = []
    digits = [int(c) for c in str(n)]
    L = len(digits)
    zero_pending = False
    for i, d in enumerate(digits):
        unit = _UNITS_SMALL[L - 1 - i]
        if d == 0:
            zero_pending = True
            continue
        if zero_pending and out:
            out.append(_DIGITS[0])
        zero_pending = False
        out.append(_DIGITS[d] + unit)
    return "".join(out)


def cardinal_reading(s: str) -> str:
    """Read an integer string as a cardinal ('10203' -> '一万零二百零三')."""
    s = s.lstrip("0") or "0"
    if len(s) > 16:
        return digit_reading(s)
    n = int(s)
    if n == 0:
        return _DIGITS[0]
    groups = []
    while n > 0:
        groups.append(n % 10000)
        n //= 10000
    out = []
    for i in range(len(groups) - 1, -1, -1):
        g = groups[i]
        if g == 0:
            continue
        text = _four_digit_reading(str(g))
        # inner-group leading zero: 100200 -> 十万零二百
        if i < len(groups) - 1 and g < 1000 and out:
            out.append(_DIGITS[0])
        out.append(text + _UNITS_BIG[i])
    text = "".join(out)
    # idiomatic 一十X -> 十X at the very front
    if text.startswith("一十"):
        text = text[1:]
    return text


def decimal_reading(s: str) -> str:
    """'3.14' -> '三点一四'."""
    int_part, _, frac = s.partition(".")
    out = cardinal_reading(int_part or "0")
    if frac:
        out += "点" + digit_reading(frac)
    return out


_FULLWIDTH = {chr(0xFF01 + i): chr(0x21 + i) for i in range(0x5E)}
_FULLWIDTH["　"] = " "


def fullwidth_to_halfwidth(text: str) -> str:
    return "".join(_FULLWIDTH.get(c, c) for c in text)


_RE_DATE = re.compile(r"(\d{4})年")
_RE_PERCENT = re.compile(r"(\d+(?:\.\d+)?)\s*%")
_RE_FRACTION = re.compile(r"(\d+)/(\d+)")
_RE_RANGE = re.compile(r"(\d+(?:\.\d+)?)[-~—]{1,2}(\d+(?:\.\d+)?)")
_RE_PHONE = re.compile(r"\d{7,}")
_RE_DECIMAL = re.compile(r"\d+\.\d+")
_RE_INT = re.compile(r"\d+")


class NSWNormalizer:
    """Pipeline object mirroring the reference API
    (`utils/text_norm.py`: `NSWNormalizer(text).normalize()`)."""

    def __init__(self, text: str):
        self.text = text

    def normalize(self) -> str:
        t = fullwidth_to_halfwidth(self.text)
        t = _RE_DATE.sub(lambda m: digit_reading(m.group(1)) + "年", t)
        t = _RE_PERCENT.sub(lambda m: "百分之" + decimal_reading(m.group(1)), t)
        t = _RE_FRACTION.sub(
            lambda m: cardinal_reading(m.group(2)) + "分之" + cardinal_reading(m.group(1)),
            t,
        )
        t = _RE_RANGE.sub(
            lambda m: decimal_reading(m.group(1)) + "到" + decimal_reading(m.group(2)), t
        )
        t = _RE_PHONE.sub(lambda m: digit_reading(m.group(0), telephone=True), t)
        t = _RE_DECIMAL.sub(lambda m: decimal_reading(m.group(0)), t)
        t = _RE_INT.sub(lambda m: cardinal_reading(m.group(0)), t)
        return t


def normalize_chinese(text: str) -> str:
    return NSWNormalizer(text).normalize()
