"""Deduplication operators for web-scale corpora.

Four families, all shuffle-disciplined for 10^12-row inputs:

- **exact**: hash-groupBy on a normalized fingerprint — one shuffle on
  the hash, map-side partial agg.
- **MinHash + LSH**: shingle → k min-hashes (ALL JVM-side: explode +
  groupBy with k ``min(xxhash64(seed‖shingle))`` aggregates) → band →
  bucket-join. Only candidate pairs inside a bucket are compared; the
  banding (b bands × r rows) tunes the Jaccard threshold s ≈ (1/b)^(1/r).
- **SimHash**: 64-bit sign-of-weighted-sum fingerprint via one Arrow
  batch UDF (numpy bit math), near-dups = Hamming ≤ d within LSH-style
  chunk buckets (pigeonhole: d bit flips can't touch all d+1 chunks).
- **embedding cosine**: exact pair cosine over candidate buckets from
  random-hyperplane signatures (see similarity.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from smcchecker_spark.ops import text as T


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Rows belonging to exact-duplicate groups (normalized text).
    Output: (id, fingerprint, group_size) for every member of a group
    with size > 1 — the pandas ``duplicated(keep=False)`` semantics at
    scale (one shuffle on the md5 fingerprint)."""
    # empty/null docs are excluded — at corpus scale they would form one
    # pathological group (and a hot key in the shuffle)
    fp = (
        df.filter(T.token_count(F.col(text_col)) > 0)
        .select(F.col(id_col), T.fingerprint(F.col(text_col)).alias("fingerprint"))
    )
    sizes = fp.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("group_size"))
    return (
        fp.join(sizes.filter(F.col("group_size") > 1), "fingerprint")
        .select(id_col, "fingerprint", "group_size")
    )


def _seeded_hash(seed: int):
    # NB: the lambda passed to F.transform must take exactly ONE argument —
    # a two-arg lambda (even `lambda s, i=i: ...` with a default!) is
    # interpreted by PySpark as (element, index) and the seed silently
    # becomes the array position. Bind the seed via closure instead.
    return lambda h: F.xxhash64(F.lit(seed), h)


def _sig_from_base(base: Column, num_hashes: int) -> Column:
    """num_hashes min-hashes from ONE base-hash array: component i is
    min over xxhash64(i, base_hash) — re-seeding hashes a LONG, not the
    shingle string, so each extra component costs O(1) per shingle."""
    return F.array(
        *[
            F.array_min(F.transform(base, _seeded_hash(i)))
            for i in range(num_hashes)
        ]
    )


def minhash_signature(col: Column, num_hashes: int = 32, shingle_k: int = 3) -> Column:
    """Array of ``num_hashes`` min-hash values over word shingles.
    NULL/short docs get an empty-shingle guard (hash of '').

    NOTE: as a single Column expression Catalyst inlines the shingle
    construction into every component — fine for tests/small data; the
    pipeline path (``minhash_signatures``) stages the computation so
    shingles and base hashes are computed once per row.
    """
    sh = T.word_shingles(col, k=shingle_k)
    sh = F.when(F.size(sh) > 0, sh).otherwise(F.array(F.lit("")))
    base = F.transform(sh, lambda s: F.xxhash64(s))
    return _sig_from_base(base, num_hashes)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig) with the computation STAGED across projections:
    shingles → base hash array → components. Each stage's output is
    referenced many times by the next, so Catalyst's CollapseProject
    keeps the stages separate instead of re-inlining the (expensive)
    shingle construction into all ``num_hashes`` component expressions —
    the single-Column form is ~num_hashes× more work per row."""
    sh = df.select(
        F.col(id_col).alias("id"),
        T.word_shingles(F.col(text_col), k=shingle_k).alias("__sh"),
    ).select(
        "id",
        F.when(F.size("__sh") > 0, F.col("__sh"))
        .otherwise(F.array(F.lit("")))
        .alias("__sh"),
    )
    base = sh.select(
        "id", F.transform("__sh", lambda s: F.xxhash64(s)).alias("__bh")
    )
    return base.select("id", _sig_from_base(F.col("__bh"), num_hashes).alias("sig"))


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b, est_jaccard) via banding.

    est_jaccard = fraction of matching signature components — computed on
    the candidate pairs only. One shuffle to bucket (explode bands +
    groupBy-join on band hash), one to dedupe pairs found in multiple
    bands. Hot buckets (boilerplate docs) self-join quadratically — cap
    with a bucket-size guard upstream if the corpus needs it.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")

    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    match_frac = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
                lambda x: x,
            )
        )
        / F.lit(num_hashes)
    )
    return pairs.select(
        "id_a", "id_b", F.round(match_frac, 6).alias("est_jaccard")
    )


def exact_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact shingle-Jaccard for given (id_a, id_b) candidate pairs —
    the verification stage after LSH blocking. Two broadcast-or-shuffle
    joins to attach shingle sets, then pure array math."""
    sh = df.select(
        F.col(id_col).alias("id"),
        T.word_shingles(F.col(text_col), k=shingle_k).alias("sh"),
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    j = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "id_a",
        "id_b",
        F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
    )


def ngram_jaccard_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Near-duplicate pairs: MinHash-LSH blocking → exact Jaccard ≥ τ."""
    cand = minhash_candidate_pairs(df, id_col, text_col, num_hashes, bands)
    exact = exact_jaccard_pairs(df, cand.select("id_a", "id_b"), id_col, text_col)
    return exact.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_CACHE: dict[str, object] = {}


def _simhash_udf():
    if "simhash" not in _SIMHASH_CACHE:

        @pandas_udf("long")
        def simhash64(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            # 64-bit simhash: per token, a deterministic 64-bit hash votes
            # +1/-1 on each bit; fingerprint = sign bits of the vote sum.
            for s in batches:
                out = np.zeros(len(s), dtype=np.int64)
                for i, txt in enumerate(s.values):
                    toks = str(txt or "").lower().split()
                    if not toks:
                        continue
                    votes = np.zeros(64, dtype=np.int64)
                    for t in toks:
                        hv = np.uint64(hash64_py(t))
                        bits = (hv >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                        votes += np.where(bits.astype(bool), 1, -1)
                    fp = np.uint64(0)
                    for b in range(64):
                        if votes[b] > 0:
                            fp |= np.uint64(1) << np.uint64(b)
                    out[i] = np.int64(fp)
                yield pd.Series(out)

        _SIMHASH_CACHE["simhash"] = simhash64
    return _SIMHASH_CACHE["simhash"]


def hash64_py(s: str) -> int:
    """Deterministic 64-bit FNV-1a (python hash() is salted per process —
    useless on executors)."""
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), _simhash_udf()(F.col(text_col)).alias("simhash")
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Pairs with simhash Hamming distance ≤ d, blocked on 16-bit chunks
    (pigeonhole: ≤3 flipped bits leave ≥1 of 4 chunks identical), so the
    join is equi- on (chunk_id, chunk_value) instead of a cross join."""
    assert 64 % chunks == 0
    width = 64 // chunks
    sh = simhash(df, id_col, text_col)
    mask = (1 << width) - 1
    chunked = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cc"),
    ).select("id", "simhash", "cc.chunk", "cc.val")
    l, r = chunked.alias("l"), chunked.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
