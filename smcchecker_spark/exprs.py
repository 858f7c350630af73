"""Shared Column-expression builders for the constraint compiler.

These are the Spark-native translations of the reference's scalar
predicates (/root/reference/proj/core/functions.py:62-172). Everything here
is a pure ``pyspark.sql.functions`` expression — JVM-side, whole-stage
codegen, no Python in the hot path (the reference used row-at-a-time
``Series.apply`` + ``lru_cache``; vectorized expressions make memoization
moot, SURVEY.md §2.2 P11).

Digit-counting semantics (precision/scale) follow the reference exactly,
including its quirks, on *string-rendered* values:

- fractions with leading zeros count from the first significant digit
  (``int(frac)`` in the reference drops leading zeros,
  proj/core/functions.py:114-121) — so 5.0012 has "2" right digits;
- trailing zeros are trimmed (the ``% 10`` loop, :117-119);
- scientific-notation strings with a negative exponent count
  ``exponent + len(mantissa fraction digits)`` with the mantissa fraction
  NOT trimmed (:96-110);
- strings with a non-negative exponent contribute 0 right digits (:112);
- a bare-integer mantissa like ``1e-05`` crashes the reference
  (``len(None)``); we define it as 0 mantissa digits instead.

Numeric columns are rendered through ``decimal(38,15)`` (plain positional
notation, no sci-notation ambiguity) with a fallback to the raw string
form for magnitudes that overflow the decimal — documented deviation: the
reference stringifies Python floats (repr-dependent), we stringify
deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Postgres timestamp literal pattern, proj/core/functions.py:73
TIMESTAMP_PATTERN = r"^\d{4}-\d{1,2}-\d{1,2}\s*(\d{1,2}:\d{1,2}:\d{2}(\.\d+)?)?$"

INT_PATTERN = r"^[+-]?\d+$"

# int2/int4/int8 bounds, proj/core/metadata.py:253-267
INT_BOUNDS = {
    "int2": (-32768, 32767),
    "int4": (-2147483648, 2147483647),
    "int8": (-9223372036854775808, 9223372036854775807),
}


def is_empty(col: Column) -> Column:
    """Reference null semantics: NULL, '' or 'nan' (any case).

    proj/core/metadata.py:203.
    """
    s = col.cast("string")
    return col.isNull() | (s == F.lit("")) | (F.lower(s) == F.lit("nan"))


def render_numeric_string(col: Column) -> Column:
    """String rendering of a value for digit math.

    String inputs pass through trimmed+lowercased (Excel-cell semantics —
    the string IS what the user typed; exact reference parity). Numeric
    inputs render through Spark's string cast (Java shortest-decimal repr)
    — a documented deviation from the reference's Python ``str(float)``
    only in the sci-notation thresholds (Java switches to sci-notation at
    |x|<1e-3, Python at <1e-4), which shifts values in [1e-4,1e-3) between
    the positional-quirk branch and the sci branch of ``right_digits``.
    Decimal-typed columns render positionally and are unaffected.
    """
    return F.lower(F.trim(col.cast("string")))


def right_digits(s: Column) -> Column:
    """Significant digits right of the decimal point, reference semantics.

    ``s`` must be a lowercase positional-or-scientific numeric string.
    Mirrors proj/core/functions.py:96-121 (see module docstring for the
    quirk inventory).
    """
    has_neg_exp = s.contains("e-")
    # sci path: exponent + mantissa fraction length (untrimmed)
    p10 = F.regexp_extract(s, r"e-0*(\d+)$", 1).try_cast("int")
    mant_frac = F.regexp_extract(s, r"\.(\d+)e-", 1)
    sci_right = p10 + F.length(mant_frac)
    # positional path: fraction with leading zeros (int() quirk) and
    # trailing zeros (the %10 loop) stripped
    frac = F.regexp_extract(s, r"\.(\d+)$", 1)
    frac_trim = F.regexp_replace(F.regexp_replace(frac, r"^0+", ""), r"0+$", "")
    pos_right = F.when(s.contains("e"), F.lit(0)).otherwise(F.length(frac_trim))
    return F.when(has_neg_exp, sci_right).otherwise(pos_right)


def left_digits(abs_val: Column) -> Column:
    """Digits left of the decimal point: int(log10(x))+1 for x>=1 else 1.

    proj/core/functions.py:95 (x is abs() there; 0<x<1 is pre-filtered by
    the precision fraction auto-pass, and scale never uses left digits).
    """
    return F.when(
        abs_val >= 1, (F.floor(F.log10(abs_val)) + F.lit(1)).cast("int")
    ).otherwise(F.lit(1))


def precision_violation(col: Column, precision: int) -> Column:
    """True where the value has more than ``precision`` significant digits.

    Reference: proj/core/functions.py:77-122. Non-numeric and null values
    pass (picked up by the dtype check); fractions 0<|x|<1 auto-pass.
    """
    xd = col.try_cast("double")
    absd = F.abs(xd)
    s = render_numeric_string(col)
    total = left_digits(absd) + right_digits(s)
    return (
        xd.isNotNull()
        & ~F.isnan(xd)
        & ~((absd > 0) & (absd < 1))
        & (total > F.lit(precision))
    )


def scale_violation(col: Column, scale: int) -> Column:
    """True where the value has more than ``scale`` fractional digits.

    Reference: proj/core/functions.py:124-166 (same digit machinery as
    precision, right side only, no fraction auto-pass).
    """
    xd = col.try_cast("double")
    s = render_numeric_string(col)
    return xd.isNotNull() & ~F.isnan(xd) & (right_digits(s) > F.lit(scale))


def dtype_violation(col: Column, dtype: str) -> Column:
    """True where the value cannot be coerced to ``dtype``.

    Reference convert_dtype, proj/core/functions.py:62-75: nulls are valid
    ints; timestamps fall back to the Postgres literal regex; everything
    is a valid str.
    """
    s = F.trim(col.cast("string"))
    if dtype == "str":
        return F.lit(False)
    if dtype == "int":
        return ~(col.isNull() | F.regexp_like(s, F.lit(INT_PATTERN)))
    if dtype == "float":
        d = s.try_cast("double")
        return ~(col.isNull() | d.isNotNull())
    if dtype == "timestamp":
        ok = (
            col.isNull()
            | F.try_to_timestamp(s).isNotNull()
            | F.regexp_like(s, F.lit(TIMESTAMP_PATTERN))
        )
        return ~ok
    raise ValueError(f"unknown dtype {dtype!r} (want int/float/str/timestamp)")


def int_range_violation(col: Column, lo: int, hi: int) -> Column:
    """True where a parseable integer falls outside [lo, hi].

    Reference: proj/core/metadata.py:253-267 (nulls pass; non-parseable
    values are the dtype check's problem — the whole-column parse gate is
    orchestrated by the compiler, see compile.py).
    """
    v = F.trim(col.cast("string")).try_cast(T.DecimalType(38, 0))
    return v.isNotNull() & ~v.between(F.lit(lo), F.lit(hi))
