"""Preprocess stage — runs before checks, part of the validation contract.

Reference: clean_data = strip_whitespace → fix_case → hardcoded_fixes
(/root/reference/proj/preprocess.py:127-146). The reference then
round-trips through Excel so checked bytes == loaded bytes
(proj/main.py:198-219); DataFrames are immutable/deterministic so that
invariant holds by construction here (SURVEY.md §2.11 C4).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def strip_whitespace(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Trim every string column (null-safe) — proj/preprocess.py:9-45."""
    targets = columns or [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    out = df
    for c in targets:
        out = out.withColumn(c, F.trim(F.col(c)))
    return out


def fix_case(
    df: DataFrame,
    column: str,
    lookup: DataFrame,
    lookup_key: str,
) -> DataFrame:
    """Replace a value with the lookup's canonical spelling when they match
    case-insensitively — proj/preprocess.py:47-116 (the reference builds a
    python replace-map per request; at scale this is a broadcast equi-join
    on the lower-cased key + coalesce, J8 in SURVEY.md §2.3)."""
    lu = F.broadcast(
        lookup.select(
            F.col(lookup_key).alias("__canon"),
            F.lower(F.col(lookup_key)).alias("__lc"),
        ).dropDuplicates(["__lc"])
    )
    joined = df.join(lu, F.lower(F.col(column)) == F.col("__lc"), "left")
    return joined.withColumn(
        column, F.coalesce(F.col("__canon"), F.col(column))
    ).drop("__canon", "__lc")


def clean_data(
    df: DataFrame,
    case_fix_lookups: dict[str, tuple[DataFrame, str]] | None = None,
    hardcoded_fixes: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Full preprocess pipeline (proj/preprocess.py:127-146).

    ``case_fix_lookups`` maps data column → (lookup df, lookup key col).
    ``hardcoded_fixes`` is the project-specific no-op hook
    (proj/preprocess.py:122-124).
    """
    out = strip_whitespace(df)
    for col, (lu, key) in (case_fix_lookups or {}).items():
        out = fix_case(out, col, lu, key)
    if hardcoded_fixes is not None:
        out = hardcoded_fixes(out)
    return out
