"""DataFrame-native Bloom filter: a word-packed bitmap built with
``bit_or`` aggregation, probed with broadcast map-side joins.

The scale problem this solves (SURVEY §4.6): referential-integrity and
dup-vs-production checks anti-join the corpus against an existing-keys
snapshot. When neither side broadcasts, that is a full shuffle of the
corpus. A Bloom filter of the existing keys splits the corpus map-side
into "definitely not present" (the overwhelming majority for
mostly-new data — they ARE the anti-join result, no shuffle needed) and
"maybe present" (members + a small false-positive sliver — only these
reach the exact join). Spark's own runtime row-level filtering does the
same thing JVM-internally, but its ``bloom_filter_agg``/``might_contain``
expressions are not registered for SQL/Python use — so this builds the
equivalent from public primitives:

- **build**: k = ``num_hashes`` positions per key via seeded xxhash64
  mod ``num_bits``, packed into 64-bit words by ``bit_or`` groupBy —
  output is ``num_bits/64`` rows, built with ONE aggregation over the
  snapshot (partial agg absorbs key skew).
- **probe**: k broadcast left joins on the word index, all map-side,
  all in one codegen stage — the corpus is never shuffled or exploded.

Sizing: ~1.44 · n · ln(1/fpp)/ln(2)² bits. The words table must fit a
broadcast (num_bits/8 bytes): 2^27 bits ≈ 16 MB handles ~10M keys at
~1% fpp. For snapshots beyond broadcast scale, build per snapshot
partition and prefilter each corpus partition against its own bloom —
the helper is deliberately a plain (word_idx, word) DataFrame so it can
be stored/partitioned like any other table.

No false negatives, ever: a member key's bits are all set by
construction, so ``prefilter_anti_join`` returns EXACTLY the plain
anti-join's rows — the bloom changes the plan, not the answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    # seeded xxhash64 is signed; pmod keeps positions in [0, num_bits)
    return [
        F.pmod(F.xxhash64(F.lit(j), key.cast("string")), F.lit(num_bits))
        for j in range(num_hashes)
    ]


def _check_params(num_bits: int, num_hashes: int) -> None:
    if num_bits < 64 or num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if not 1 <= num_hashes <= 16:
        raise ValueError(f"num_hashes must be in [1,16], got {num_hashes}")


def bloom_build(
    keys: DataFrame, key_col: str, num_bits: int, num_hashes: int = 4
) -> DataFrame:
    """Bloom bitmap of ``keys[key_col]`` as (word_idx: long, word: long)
    rows — only words with at least one set bit are present. ONE
    explode (k rows per key, ids-free) + ONE groupBy on the word index;
    output is at most ``num_bits/64`` rows regardless of key count."""
    _check_params(num_bits, num_hashes)
    pos = F.explode(
        F.array(*_positions(F.col(key_col), num_bits, num_hashes))
    ).alias("pos")
    return (
        keys.select(pos)
        .select(
            F.shiftright("pos", 6).alias("word_idx"),
            # the Python shiftleft() wants a literal count; column-valued
            # shifts go through the SQL expression form
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def might_contain(
    df: DataFrame,
    key_col: str,
    words: DataFrame,
    num_bits: int,
    num_hashes: int = 4,
    flag_col: str = "__maybe",
) -> DataFrame:
    """``df`` plus a boolean ``flag_col``: False ⇒ the key is DEFINITELY
    not in the built set; True ⇒ it may be (members always flag True).
    k broadcast left joins on the word index — map-side, no shuffle of
    ``df``, no row multiplication. The words table is materialized once
    (``localCheckpoint``): the k join branches rename its columns
    differently, which defeats exchange reuse — without the barrier the
    build aggregation (and whatever scan feeds it) would run k times."""
    _check_params(num_bits, num_hashes)
    words = words.localCheckpoint(eager=True)
    out = df
    hits = []
    for j, pos in enumerate(_positions(F.col(key_col), num_bits, num_hashes)):
        w = F.broadcast(
            words.select(
                F.col("word_idx").alias(f"__wi{j}"), F.col("word").alias(f"__w{j}")
            )
        )
        out = out.withColumn(f"__p{j}", pos).join(
            w, F.shiftright(f"__p{j}", 6) == F.col(f"__wi{j}"), "left"
        )
        hits.append(
            F.coalesce(
                F.expr(f"shiftright(__w{j}, CAST(__p{j} % 64 AS INT)) & 1") == 1,
                F.lit(False),
            )
        )
    flag = hits[0]
    for h in hits[1:]:
        flag = flag & h
    drop = [c for j in range(num_hashes) for c in (f"__p{j}", f"__wi{j}", f"__w{j}")]
    return out.withColumn(flag_col, flag).drop(*drop)


def prefilter_anti_join(
    df: DataFrame,
    key_col: str,
    existing: DataFrame,
    existing_key: str | None = None,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
    words: DataFrame | None = None,
) -> DataFrame:
    """Rows of ``df`` whose key is NOT in ``existing`` — bit-identical to
    ``df.join(existing, key, "left_anti")`` (NULL keys pass, matching
    anti-join semantics), but only the bloom-positive sliver reaches the
    exact join: definite negatives short-circuit map-side, so the
    shuffled volume drops from |df| to |members| + fp·|df|.

    ``words``: a prebuilt/stored bitmap (from :func:`bloom_build` with
    the SAME num_bits/num_hashes over the same key) — pass it to skip
    the build aggregation when many prefilters run against one snapshot
    (the bloom is a plain DataFrame, persistable like any table)."""
    existing_key = existing_key or key_col
    if words is None:
        words = bloom_build(existing, existing_key, num_bits, num_hashes)
    flagged = might_contain(df, key_col, words, num_bits, num_hashes)
    definite_no = flagged.filter(
        ~F.col("__maybe") | F.col(key_col).isNull()
    ).drop("__maybe")
    maybe = flagged.filter(F.col("__maybe") & F.col(key_col).isNotNull()).drop(
        "__maybe"
    )
    ex = existing.select(F.col(existing_key).alias("__ek")).distinct()
    confirmed_no = maybe.join(
        ex, F.col(key_col) == F.col("__ek"), "left_anti"
    )
    return definite_no.unionByName(confirmed_no)
