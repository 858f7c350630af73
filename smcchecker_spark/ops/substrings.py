"""Exact substring-span deduplication (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499): find every W-token window whose exact text occurs
at more than one (doc, position) across the corpus, keep the globally
first occurrence, and merge the remaining occurrences into maximal
per-document token spans — the cross-document EXACT-substring
complement to MinHash/SimHash whole-document near-dup.

Spark-first shape (the paper's suffix array is a single-machine
structure; this is the distributed equivalent for a fixed window):

1. **Window hashing, map-only.** Tokens (whitespace split, the
   ``ops.text.tokens`` convention) → per-position ``xxhash64`` of each
   W-token window, all inside one JVM projection (``transform`` over
   ``sequence`` + ``slice`` + ``concat_ws`` — no Python, no explode of
   window TEXT). The shuffle that follows carries (hash, doc_id, pos)
   = ~24 bytes/position, never the W-token strings (a text-keyed
   first pass would shuffle W× the corpus bytes).
2. **Candidate hashes.** groupBy(hash) keeps hashes with ≥2
   occurrences — at realistic duplication rates a sliver of the
   corpus. Exact recall: text-equal windows always hash equal.
3. **Exact-text confirmation on the sliver.** Candidate occurrences
   re-derive their window text (join back on doc_id — ids-only
   semi-join, then one slice per surviving position) for a per-hash
   min/max-text AUDIT that collapses map-side, so an xxhash64
   collision can never merge two distinct substrings — hashing only
   prunes, equality decides — and window text never rides a wide
   shuffle (one partial row per (hash, partition), even when an
   adversarial corpus duplicates every window).
4. **Keeper + span merge.** Per distinct window text, the (doc_id,
   pos)-smallest occurrence survives — computed as a min-struct
   AGGREGATION per hash (partial-combinable: a boilerplate window
   with 10^9 occurrences reduces map-side instead of landing on one
   row_number task); rare colliding hashes fall to an exact per-text
   rank. Every other occurrence becomes a [pos, pos+W) interval,
   merged per document with the classic running-max island pass (two
   window functions over the per-doc sliver — no self-join).

``remove_duplicate_substrings`` applies the spans: tokens whose
position falls in any span are dropped and the text is rebuilt — one
aggregation to collect a doc's spans (slivers) + one map-side filter.

Reference scope: beyond-reference training-pipeline layer (the brief's
dedup axis); no counterpart in SCCWRP/smcchecker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from smcchecker_spark.ops import text as T


def _window_hashes(df: DataFrame, id_col: str, text_col: str, window: int):
    """(id, pos, h): xxhash64 of the W-token window at each position —
    one JVM projection, 0-based positions."""
    base = df.select(
        F.col(id_col), T.tokens(F.col(text_col)).alias("_toks")
    ).filter(F.size("_toks") >= window)
    return base.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - window),
                lambda i: F.xxhash64(
                    F.concat_ws(" ", F.slice("_toks", i + F.lit(1), window))
                ),
            )
        ).alias("pos", "h"),
    )


def duplicate_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    keep_first: bool = True,
) -> DataFrame:
    """Per-document merged token spans [span_start, span_end) covering
    every duplicated W-token window occurrence (minus, when
    ``keep_first``, the globally (doc_id, pos)-first occurrence of each
    distinct window text). Output: (id, span_start, span_end), one row
    per maximal span."""
    wins = _window_hashes(df, id_col, text_col, window)
    dup_h = wins.groupBy("h").agg(F.count(F.lit(1)).alias("_n")).filter(
        F.col("_n") >= 2
    )
    # checkpoint the CANDIDATE OCCURRENCES as (id, pos, h) only — ~24
    # bytes/row even when an adversarial corpus duplicates every window;
    # window TEXT never enters the checkpoint or any wide shuffle
    cand = wins.join(dup_h.select("h"), "h").localCheckpoint()

    def _with_text(c: DataFrame) -> DataFrame:
        """Re-slice window text for a candidate subset (the exact-text
        evidence pass — text stays partition-local until the map-side
        combine below)."""
        toks = df.select(
            F.col(id_col), T.tokens(F.col(text_col)).alias("_toks")
        ).join(c.select(id_col).distinct(), id_col)
        return c.join(toks, id_col).select(
            id_col, "pos", "h",
            F.concat_ws(
                " ", F.slice("_toks", F.col("pos") + F.lit(1), window)
            ).alias("wtext"),
        )

    # Collision audit per hash — ONE map-side-combined aggregation
    # (min/max text collapse per partition before the shuffle, so the
    # shuffle ships a few texts per (hash, partition), never one per
    # occurrence). A hash whose min == max text holds exactly one
    # window string: hashing decided nothing, text equality did.
    # Colliding hashes (distinct texts sharing an xxhash64 — ~0 in
    # practice) fall to an exact per-text path below, so collisions can
    # only prune, never merge.
    audit = _with_text(cand).groupBy("h").agg(
        F.min("wtext").alias("_lo"), F.max("wtext").alias("_hi")
    )
    clean_h = audit.filter(F.col("_lo") == F.col("_hi")).select("h")
    coll_h = audit.filter(F.col("_lo") != F.col("_hi")).select("h")
    # Text-uniform hashes: keeper = min (id, pos) struct per hash — a
    # partial-aggregable reduction (tiny shuffle: one row per hash), so
    # a boilerplate window with 10^9 occurrences combines map-side
    # instead of landing on one row_number task (the skew cliff the
    # text-keyed window form would have).
    occ_clean = cand.join(clean_h, "h")
    if keep_first:
        keep_clean = occ_clean.groupBy("h").agg(
            F.min(F.struct(id_col, "pos")).alias("_k")
        ).select("h", F.col(f"_k.{id_col}").alias("_kid"),
                 F.col("_k.pos").alias("_kpos"))
        dropped_clean = (
            occ_clean.join(keep_clean, "h")
            .filter(~((F.col(id_col) == F.col("_kid"))
                      & (F.col("pos") == F.col("_kpos"))))
            .select(id_col, "pos")
        )
    else:
        dropped_clean = occ_clean.select(id_col, "pos")
    # Colliding hashes (sliver): exact per-text count + keeper rank.
    occ_coll = _with_text(cand.join(coll_h, "h"))
    wtxt = Window.partitionBy("wtext")
    grp = occ_coll.withColumn(
        "_rk",
        F.row_number().over(wtxt.orderBy(F.asc(id_col), F.asc("pos"))),
    ).withColumn("_cnt", F.count(F.lit(1)).over(wtxt))
    dropped_coll = grp.filter(
        (F.col("_cnt") >= 2)
        & (F.col("_rk") >= (2 if keep_first else 1))
    ).select(id_col, "pos")
    dropped = dropped_clean.unionByName(dropped_coll)
    # island merge: spans [pos, pos+W) per doc, overlap-or-adjacent
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    marked = (
        dropped.distinct()
        .withColumn(
            "_prev_max",
            F.max(F.col("pos") + window).over(
                wdoc.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .withColumn(
            "_new",
            (F.col("_prev_max").isNull()
             | (F.col("pos") > F.col("_prev_max"))).cast("int"),
        )
        .withColumn("_island", F.sum("_new").over(wdoc))
    )
    return (
        marked.groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + window).alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )


def remove_duplicate_substrings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    out_col: str = "dedup_text",
) -> DataFrame:
    """Rebuild each document's text with every duplicated-span token
    removed (first global occurrence kept): collect a doc's spans (a
    sliver) into an array, then one JVM filter over token positions —
    map-side after the span join, no Python stage."""
    spans = duplicate_substring_spans(df, id_col, text_col, window)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = T.tokens(F.col(text_col))
    kept = F.filter(
        F.transform(toks, lambda tok, i: F.struct(
            tok.alias("t"), i.alias("i")
        )),
        lambda s: ~F.exists(
            F.col("_spans"),
            lambda sp: (s["i"] >= sp["span_start"])
            & (s["i"] < sp["span_end"]),
        ),
    )
    return (
        df.join(per_doc, id_col, "left")
        .withColumn(
            out_col,
            F.when(F.col("_spans").isNull(), F.col(text_col)).otherwise(
                F.concat_ws(
                    " ", F.transform(kept, lambda s: s["t"])
                )
            ),
        )
        .drop("_spans")
    )
