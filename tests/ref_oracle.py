"""Pure-Python test oracle for the digit-count predicates.

Reimplements the *semantics* of the reference's check_precision /
check_scale / convert_dtype (/root/reference/proj/core/functions.py:62-166)
— including the leading-zero int() quirk and the sci-notation branch — as
an independent implementation used only to property-test the Spark
expressions in smcchecker_spark/exprs.py. Deviations (documented in
exprs.py): the gate is float-parseability, and a bare-integer sci mantissa
('1e-05') counts 0 mantissa digits instead of crashing.
"""

from __future__ import annotations

import math
import re


def right_digits(s: str) -> int:
    s = s.strip().lower()
    if "e-" in s:
        p10 = int(s.split("e-")[-1])
        m = re.search(r"\.(\d+)", s.split("e-")[0])
        return p10 + (len(m.group(1)) if m else 0)
    if "e" in s:
        return 0
    m = re.search(r"\.(\d+)$", s)
    if not m:
        return 0
    fi = int(m.group(1)) if m.group(1) else 0
    while fi > 0 and fi % 10 == 0:
        fi //= 10
    return len(str(fi)) if fi > 0 else 0


def parses_float(s) -> bool:
    if s is None:
        return False
    try:
        float(str(s).strip())
        return True
    except ValueError:
        return False


def precision_violates(s, p: int) -> bool:
    if not parses_float(s):
        return False
    x = abs(float(str(s).strip()))
    if math.isnan(x):
        return False
    if 0 < x < 1:
        return False
    left = int(math.log10(x)) + 1 if x >= 1 else 1
    return left + right_digits(str(s)) > p


def scale_violates(s, sc: int) -> bool:
    if not parses_float(s):
        return False
    if math.isnan(float(str(s).strip())):
        return False
    return right_digits(str(s)) > sc


def int_parses(s) -> bool:
    """Reference convert_dtype(int, x): nulls valid, else int literal."""
    if s is None:
        return True
    return re.fullmatch(r"[+-]?\d+", str(s).strip()) is not None
