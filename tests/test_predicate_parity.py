"""Property-style parity: Spark digit predicates vs the lifted pure-Python
oracle (SURVEY.md §5 item 2) over a seeded random corpus of numeric-string
shapes (incl. sci-notation, signs, leading/trailing zeros, junk).

One Spark pass evaluates all predicates for the whole corpus — running a
Spark job per hypothesis example would be pathologically slow, so this is
the seeded-corpus variant the survey allows.
"""

import random

from pyspark.sql import functions as F

from smcchecker_spark import exprs
from tests import ref_oracle


def _corpus(n=400, seed=42):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        kind = rng.randrange(7)
        sign = rng.choice(["", "-", "+"])
        ip = "".join(rng.choice("0123456789") for _ in range(rng.randint(1, 6)))
        fp = "".join(rng.choice("0123456789") for _ in range(rng.randint(0, 6)))
        if kind == 0:
            out.append(sign + ip)
        elif kind == 1:
            out.append(f"{sign}{ip}.{fp}" if fp else sign + ip)
        elif kind == 2:
            out.append(f"{sign}{ip}.{fp}e-{rng.randint(1, 9)}")
        elif kind == 3:
            out.append(f"{sign}{ip}e-{rng.randint(1, 9)}")
        elif kind == 4:
            out.append(f"{sign}{ip}.{fp}e{rng.randint(1, 9)}")
        elif kind == 5:
            out.append(rng.choice(["abc", "", "nan", "1.2.3", "12a"]))
        else:
            out.append(f"{sign}0.{'0' * rng.randint(0, 4)}{fp or '1'}")
    return out


def test_digit_predicate_parity(spark):
    corpus = _corpus()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(corpus)], "id int, v string"
    )
    settings = [(2, 1), (5, 3), (8, 6)]
    cols = []
    for p, s in settings:
        cols.append(exprs.precision_violation(F.col("v"), p).alias(f"p{p}"))
        cols.append(exprs.scale_violation(F.col("v"), s).alias(f"s{s}"))
    cols.append(exprs.dtype_violation(F.col("v"), "int").alias("not_int"))
    rows = {r["id"]: r for r in df.select("id", *cols).collect()}

    mismatches = []
    for i, v in enumerate(corpus):
        r = rows[i]
        for p, s in settings:
            want_p = ref_oracle.precision_violates(v, p)
            want_s = ref_oracle.scale_violates(v, s)
            if bool(r[f"p{p}"]) != want_p:
                mismatches.append((v, f"precision({p})", bool(r[f"p{p}"]), want_p))
            if bool(r[f"s{s}"]) != want_s:
                mismatches.append((v, f"scale({s})", bool(r[f"s{s}"]), want_s))
        want_int = not ref_oracle.int_parses(v)
        if bool(r["not_int"]) != want_int:
            mismatches.append((v, "dtype_int", bool(r["not_int"]), want_int))
    assert not mismatches, mismatches[:20]
