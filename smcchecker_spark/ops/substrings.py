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


def long_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed_window: int = 4,
    min_len: int = 50,
    max_gap: int = 8,
    min_seeds: int = 8,
    max_occ: int = 64,
) -> DataFrame:
    """Variable-length NEAR-exact duplicated passages ≥ ``min_len``
    tokens — the seed-and-extend complement to the fixed-window op,
    approximating Lee et al.'s ≥50-token maximal spans for passages
    whose exact-window structure is broken by sparse edits (a 400-token
    shared passage with one token changed every 7 evades EVERY 8-token
    exact window; its unchanged runs still carry 4-token seeds).

    BLAST-style, all DataFrame ops:

    1. **Seeds.** Exact ``seed_window``-token window matches, via the
       same map-only hashing as the fixed-W pass. Hashes kept when
       2 ≤ occurrences ≤ ``max_occ``: singletons pair nothing; hotter
       windows are stop-phrase boilerplate whose pairs are quadratic
       noise (the fixed-W pass already handles exact boilerplate), so
       the cap is a documented precision/cost guard, not a correctness
       hole for the long-passage target.
    2. **Pairs.** Occurrences self-paired per hash through
       ``dedup.bucketed_pairs`` (members are (id, pos) structs —
       ids-only shuffle, hot-hash chunking for free; buckets partition
       the occurrences so ``dedup_pairs=False`` skips the cross-bucket
       shuffle). Struct order gives (id_a, pos_a) < (id_b, pos_b).
    3. **Diagonal chaining.** A shared passage puts ALL its seed pairs
       on one alignment diagonal ``diag = pos_a − pos_b`` of one doc
       pair. groupBy-free: the classic island pass over ``pos_a``
       within (id_a, id_b, diag), seeds chaining while start-gaps ≤
       ``seed_window + max_gap`` (consecutive surviving seeds in the
       mutated-passage case are ≤ edit-period apart). Chains must span
       ≥ ``min_len`` tokens with ≥ ``min_seeds`` seeds — an xxhash64
       seed collision (or a chance shared 4-gram) can contribute ONE
       spurious seed, never ``min_seeds`` of them on one diagonal, so
       collisions/coincidences cannot fabricate a span.
    4. **Keeper + merge.** The a-side (globally earlier occurrence) is
       the keeper; the b-side projects through the diagonal
       (``pos_b = pos_a − diag``) and overlapping b-spans merge per doc
       with the running-max interval pass.

    Output: (id, span_start, span_end), one row per maximal merged
    near-duplicate passage on the dropped side. Scale: every shuffle
    after tokenization carries (hash|ids, positions) only; pair volume
    is bounded by ``max_occ``²/2 per hash; chaining shuffles pairs once
    on (id_a, id_b, diag). No text ever rides a wide shuffle.
    """
    from smcchecker_spark.ops.dedup import bucketed_pairs

    seeds = _window_hashes(df, id_col, text_col, seed_window)
    keep_h = (
        seeds.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter((F.col("_n") >= 2) & (F.col("_n") <= max_occ))
        .select("h")
    )
    occ = seeds.join(keep_h, "h").select(
        "h", F.struct(F.col(id_col).alias("id"), "pos").alias("m")
    )
    pairs = bucketed_pairs(
        occ, ["h"], member_col="m", dedup_pairs=False
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("a.pos").alias("pos_a"),
        F.col("b.id").alias("id_b"),
        F.col("b.pos").alias("pos_b"),
    )
    # A (doc pair, diagonal) can repeat a (pos_a, pos_b) seed only if
    # two distinct window texts collided in xxhash64 at the same spot —
    # impossible (one window text per (id, pos)); pairs are distinct by
    # construction, so chain stats need no dedup.
    diag = pairs.withColumn("diag", F.col("pos_a") - F.col("pos_b"))
    wchain = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    chained = (
        diag.withColumn(
            "_prev",
            F.max("pos_a").over(
                wchain.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .withColumn(
            "_new",
            (
                F.col("_prev").isNull()
                | (F.col("pos_a") - F.col("_prev")
                   > seed_window + max_gap)
            ).cast("int"),
        )
        .withColumn("_chain", F.sum("_new").over(wchain))
    )
    chains = (
        chained.groupBy("id_a", "id_b", "diag", "_chain")
        .agg(
            F.min("pos_a").alias("a_start"),
            (F.max("pos_a") + seed_window).alias("a_end"),
            F.count(F.lit(1)).alias("n_seeds"),
        )
        .filter(
            (F.col("a_end") - F.col("a_start") >= min_len)
            & (F.col("n_seeds") >= min_seeds)
        )
    )
    b_spans = chains.select(
        F.col("id_b").alias(id_col),
        (F.col("a_start") - F.col("diag")).alias("span_start"),
        (F.col("a_end") - F.col("diag")).alias("span_end"),
    )
    # interval merge per doc (spans vary in length, unlike the fixed-W
    # island pass): running max of span_end over earlier spans; a span
    # starting past it opens a new merged interval
    wdoc = Window.partitionBy(id_col).orderBy("span_start", "span_end")
    marked = (
        b_spans.distinct()
        .withColumn(
            "_prev_max",
            F.max("span_end").over(
                wdoc.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .withColumn(
            "_new",
            (
                F.col("_prev_max").isNull()
                | (F.col("span_start") > F.col("_prev_max"))
            ).cast("int"),
        )
        .withColumn("_island", F.sum("_new").over(wdoc))
    )
    return (
        marked.groupBy(id_col, "_island")
        .agg(
            F.min("span_start").alias("span_start"),
            F.max("span_end").alias("span_end"),
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
    return apply_span_removal(df, spans, id_col, text_col, out_col)


def remove_long_duplicate_substrings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "dedup_text",
    **span_kwargs,
) -> DataFrame:
    """Apply-side of :func:`long_duplicate_spans`: rebuild each doc with
    its near-exact ≥min_len duplicated passages removed (keeper side
    untouched). ``span_kwargs`` pass through (seed_window, min_len,
    max_gap, min_seeds, max_occ). Same map-side span application as the
    fixed-W removal."""
    spans = long_duplicate_spans(df, id_col, text_col, **span_kwargs)
    return apply_span_removal(df, spans, id_col, text_col, out_col)


def apply_span_removal(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "dedup_text",
) -> DataFrame:
    """Drop every token whose position falls inside any of the doc's
    [span_start, span_end) intervals and rebuild the text. The spans
    side is the duplicated sliver (grouped to one array row per
    affected doc); the corpus side stays map-only after the left
    join — no Python stage, no corpus shuffle."""
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
