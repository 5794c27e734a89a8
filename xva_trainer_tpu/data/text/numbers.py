"""English number normalization (self-contained; no `inflect` dependency).

Covers the reference's numerical expansions (python/fastpitch1_1/common/text/
numerical.py semantics): currency, ordinals, years, decimals, plain numbers.
"""
from __future__ import annotations

import re

_UNITS = [
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen",
]
_TENS = [
    "", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
    "eighty", "ninety",
]
_SCALES = [
    (10**12, "trillion"), (10**9, "billion"), (10**6, "million"), (1000, "thousand"),
]

_ORDINAL_UNITS = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def number_to_words(n: int) -> str:
    if n < 0:
        return "minus " + number_to_words(-n)
    if n < 20:
        return _UNITS[n]
    if n < 100:
        t, u = divmod(n, 10)
        return _TENS[t] + ("" if u == 0 else " " + _UNITS[u])
    if n < 1000:
        h, r = divmod(n, 100)
        out = _UNITS[h] + " hundred"
        return out + ("" if r == 0 else " " + number_to_words(r))
    for scale, name in _SCALES:
        if n >= scale:
            q, r = divmod(n, scale)
            out = number_to_words(q) + " " + name
            return out + ("" if r == 0 else " " + number_to_words(r))
    return str(n)


def ordinal_to_words(n: int) -> str:
    words = number_to_words(n)
    parts = words.rsplit(" ", 1)
    last = parts[-1]
    if "-" in last:
        head, u = last.rsplit("-", 1)
        last = head + "-" + _ORDINAL_UNITS.get(u, u + ("ieth" if u.endswith("y") else "th"))
    elif last in _ORDINAL_UNITS:
        last = _ORDINAL_UNITS[last]
    elif last.endswith("y"):
        last = last[:-1] + "ieth"
    else:
        last = last + "th"
    parts[-1] = last
    return " ".join(parts)


def year_to_words(n: int) -> str:
    if 1000 <= n < 3000:
        if n % 1000 == 0:
            return number_to_words(n)
        if n % 100 == 0:
            return number_to_words(n // 100) + " hundred"
        if 2000 < n < 2010:
            return "two thousand " + number_to_words(n % 100)
        hi, lo = divmod(n, 100)
        lo_words = ("oh " + _UNITS[lo]) if lo < 10 else number_to_words(lo)
        return number_to_words(hi) + " " + lo_words
    return number_to_words(n)


_comma_re = re.compile(r"([0-9][0-9,]+[0-9])")
_dollars_re = re.compile(r"\$([0-9.,]*[0-9]+)")
_pounds_re = re.compile(r"£([0-9.,]*[0-9]+)")
_decimal_re = re.compile(r"([0-9]+\.[0-9]+)")
_ordinal_re = re.compile(r"([0-9]+)(st|nd|rd|th)")
_year_re = re.compile(r"\b([12][0-9]{3})\b")
_number_re = re.compile(r"[0-9]+")


def _expand_dollars(m):
    parts = m.group(1).replace(",", "").split(".")
    dollars = int(parts[0]) if parts[0] else 0
    cents = int(parts[1][:2].ljust(2, "0")) if len(parts) > 1 and parts[1] else 0
    out = []
    if dollars:
        out.append(number_to_words(dollars) + (" dollar" if dollars == 1 else " dollars"))
    if cents:
        out.append(number_to_words(cents) + (" cent" if cents == 1 else " cents"))
    return ", ".join(out) if out else "zero dollars"


def _expand_decimal(m):
    intpart, frac = m.group(1).split(".")
    return (
        number_to_words(int(intpart))
        + " point "
        + " ".join(_UNITS[int(d)] for d in frac)
    )


def normalize_numbers(text: str) -> str:
    text = _comma_re.sub(lambda m: m.group(1).replace(",", ""), text)
    text = _dollars_re.sub(_expand_dollars, text)
    text = _pounds_re.sub(lambda m: _expand_dollars(m).replace("dollar", "pound"), text)
    text = _decimal_re.sub(_expand_decimal, text)
    text = _ordinal_re.sub(lambda m: ordinal_to_words(int(m.group(1))), text)
    text = _year_re.sub(lambda m: year_to_words(int(m.group(1))), text)
    text = _number_re.sub(lambda m: number_to_words(int(m.group(0))), text)
    return text
