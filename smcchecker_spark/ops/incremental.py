"""Incremental near-duplicate detection against a persisted MinHash index.

Reference parity: SCCWRP/smcchecker never re-validates its accepted
corpus — each new submission is checked against the production tables as
a stored artifact (duplicate core checks, `proj/core_checks.py`; the
engine's exact analogue is ``constraints.NotInExisting``). This module is
the NEAR-duplicate version of that contract at training-corpus scale:
the accepted corpus' MinHash band index is computed and stored ONCE
(:func:`save_minhash_index`); each ingest batch probes only the buckets
it actually hashes into (:func:`incremental_candidate_pairs`), so the
quadratic old x old pairing — the bulk of full-corpus dedup, already done
when the corpus was accepted — is never repeated. Accepted batches are
folded into the index with :func:`append_to_minhash_index`.

Scale story (the reason this exists at 10^12 docs): full re-dedup of
corpus+batch costs a corpus scan, a corpus-wide signature UDF pass, and a
corpus-wide bucket shuffle per ingest. The incremental probe touches the
batch (signature UDF) plus a MAP-SIDE-pruned scan of the stored band
index: the batch's distinct (band, bucket) keys are broadcast, so index
rows outside the batch's buckets are filtered at the scan — the index
never fully shuffles, and old docs' signatures are never recomputed
(est-scoring reads the stored signature table, pruned to candidates).
Hot buckets (boilerplate) are chunked on BOTH sides, so one bucket's
pairing spreads across tasks bounded by chunk^2 structs per row — the
same guard discipline as ``dedup.bucketed_pairs``.

Regime: intended for new << old (the incremental premise). The batch's
per-bucket member arrays are broadcast to spread hot OLD buckets without
a bucket-keyed shuffle join; for a batch too large to broadcast
(~10M+ docs), split the ingest or fall back to
``dedup.minhash_candidate_pairs`` on the union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smcchecker_spark.ops.dedup import (
    _chunked_members,
    banded_rows,
    bucketed_pairs,
    exact_jaccard_pairs,
    minhash_signatures,
    pair_est_jaccard,
)

_META_SCHEMA = "num_hashes int, bands int, shingle_k int"


def save_minhash_index(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 16,
    shingle_k: int = 3,
    min_parallelism: int | None = None,
) -> None:
    """Build and persist the corpus' MinHash index at ``path``:

    - ``{path}/sigs``   — (id, sig: array<bigint>), the raw signatures
      (kept so incremental est-scoring never re-runs the signature UDF
      over old docs);
    - ``{path}/banded`` — (bucket, id) hive-partitioned BY BAND (a probe
      using fewer bands, or Iceberg metadata filtering on band, prunes
      whole partitions);
    - ``{path}/meta``   — the 1-row parameter record; probes and appends
      MUST band identically, so they read parameters from here rather
      than trusting the caller.

    ONE signature-UDF pass: signatures are written first and band rows
    derive from the stored table (second pass reads parquet, not the
    UDF). Ids must be unique across the corpus AND every future batch —
    pair identity is (id_a, id_b).

    Layout: both tables carry an ``ingest`` hive-partition label
    ("base" here, one label per append). Appends with a label are
    IDEMPOTENT — dynamic partition overwrite replaces that label's
    partitions — which is what a streaming replay of a micro-batch
    needs for exactly-once index growth (Iceberg analogue:
    overwritePartitions on the ingest transform)."""
    assert num_hashes % bands == 0
    spark = df.sparkSession
    spark.createDataFrame(
        [(num_hashes, bands, shingle_k)], _META_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_k, min_parallelism
    ).withColumn("ingest", F.lit("base")).write.mode("overwrite").partitionBy(
        "ingest"
    ).parquet(f"{path}/sigs")
    sig = _read_sigs(spark, path)
    banded_rows(sig, num_hashes, bands).withColumn(
        "ingest", F.lit("base")
    ).write.mode("overwrite").partitionBy("ingest", "band").parquet(
        f"{path}/banded"
    )


def _read_sigs(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/sigs").select("id", "sig")


def _read_banded(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/banded").select("band", "bucket", "id")


def load_minhash_meta(spark: SparkSession, path: str) -> dict:
    r = spark.read.parquet(f"{path}/meta").first()
    return {k: r[k] for k in ("num_hashes", "bands", "shingle_k")}


def append_to_minhash_index(
    new_df: DataFrame,
    path: str,
    id_col: str,
    text_col: str = "text",
    min_parallelism: int | None = None,
    ingest_label: str | None = None,
) -> None:
    """Fold an ACCEPTED batch into the index (sigs + banded appends,
    parameters from the stored meta). Caller contract: batch ids are not
    already present (run the probe + your dedup policy first).

    ``ingest_label`` names the batch's hive partition; with a label the
    write is dynamic-partition OVERWRITE — replaying the same batch
    (streaming recovery) replaces its own partitions instead of
    duplicating rows. Without a label, rows land under one
    ``ingest=append`` partition via plain append (non-idempotent; fine
    for one-shot batch use). Iceberg spelling: overwritePartitions in
    one transaction covering both tables."""
    spark = new_df.sparkSession
    meta = load_minhash_meta(spark, path)
    # batch-sized; materialize once so the sig write and the band write
    # share ONE UDF pass (the stored sigs table is never re-read — at
    # corpus scale it is as big as the corpus)
    sig_new = minhash_signatures(
        new_df,
        id_col,
        text_col,
        meta["num_hashes"],
        meta["shingle_k"],
        min_parallelism,
    ).localCheckpoint(eager=True)
    label = ingest_label if ingest_label is not None else "append"
    mode = "overwrite" if ingest_label is not None else "append"

    def _write(df: DataFrame, parts: list[str], dest: str) -> None:
        (
            df.withColumn("ingest", F.lit(label))
            .write.mode(mode)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*parts)
            .parquet(dest)
        )

    _write(sig_new, ["ingest"], f"{path}/sigs")
    _write(
        banded_rows(sig_new, meta["num_hashes"], meta["bands"]),
        ["ingest", "band"],
        f"{path}/banded",
    )


def incremental_candidate_pairs(
    new_df: DataFrame,
    path: str,
    id_col: str,
    text_col: str = "text",
    hot_bucket: int = 256,
    min_parallelism: int | None = None,
    with_est: bool = False,
) -> DataFrame:
    """LSH candidate pairs (id_a, id_b[, est_jaccard]) touching the new
    batch: new x new (via the skew-guarded ``bucketed_pairs`` core) UNION
    new x old (batch bands probed against the stored index). Old x old is
    NEVER enumerated — that work happened when the corpus was indexed.

    new x old plan: the batch's distinct (band, bucket) keys broadcast
    into a left-semi prune of the index scan (map-side filter — the
    index never shuffles in full); surviving old rows group per bucket
    into sorted member arrays, chunked to ``hot_bucket`` and
    repartitioned on (band, bucket, chunk) so a hot old bucket's pairing
    spreads across tasks; the batch's per-bucket members (also chunked)
    broadcast onto those rows, bounding every task's explode at
    hot_bucket^2 structs per row — the ``bucketed_pairs`` discipline,
    one-sided. Cross-band repeats collapse via dropDuplicates (ids only).

    ``with_est=True`` scores est_jaccard from SIGNATURES: the batch's
    (checkpointed) signatures plus the STORED old signatures pruned to
    candidate ids — zero old-doc text access, zero old-doc UDF work."""
    spark = new_df.sparkSession
    meta = load_minhash_meta(spark, path)
    sig_new = minhash_signatures(
        new_df,
        id_col,
        text_col,
        meta["num_hashes"],
        meta["shingle_k"],
        min_parallelism,
        # referenced by banding, new x new pairing, and est — materialize
        # the (batch-sized) signature table once instead of re-running
        # the UDF per consumer
    ).localCheckpoint(eager=True)
    banded_new = banded_rows(sig_new, meta["num_hashes"], meta["bands"])

    nn = bucketed_pairs(
        banded_new.select(F.struct(F.col("id")).alias("m"), "band", "bucket"),
        ["band", "bucket"],
        hot_bucket=hot_bucket,
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))

    old = _read_banded(spark, path)
    keys = banded_new.select("band", "bucket").distinct()
    grouped_old = (
        old.join(F.broadcast(keys), ["band", "bucket"], "left_semi")
        .groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list(F.struct(F.col("id")))).alias("ms"))
    )
    old_chunks = _chunked_members(
        grouped_old, ["band", "bucket"], hot_bucket
    ).repartition("band", "bucket", "ci")
    new_chunks = F.broadcast(
        _chunked_members(
            banded_new.groupBy("band", "bucket").agg(
                F.array_sort(F.collect_list(F.struct(F.col("id")))).alias("ms")
            ),
            ["band", "bucket"],
            hot_bucket,
            idx_name="nj",
            arr_name="na",
        )
    )
    on = (
        old_chunks.join(new_chunks, ["band", "bucket"])
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ca"),
                        lambda o: F.transform(
                            F.col("na"),
                            lambda n: F.struct(o.alias("o"), n.alias("n")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.o", "p.n")
    )
    no = on.select(
        F.when(F.col("o") < F.col("n"), F.col("o.id"))
        .otherwise(F.col("n.id"))
        .alias("id_a"),
        F.when(F.col("o") < F.col("n"), F.col("n.id"))
        .otherwise(F.col("o.id"))
        .alias("id_b"),
    )
    pairs = nn.unionByName(no).dropDuplicates(["id_a", "id_b"])
    if not with_est:
        return pairs

    pairs = pairs.localCheckpoint(eager=True)
    cand = F.broadcast(
        pairs.select(F.explode(F.array("id_a", "id_b")).alias("id")).distinct()
    )
    old_sigs = _read_sigs(spark, path).join(cand, "id", "left_semi")
    new_ids = F.broadcast(sig_new.select("id"))
    sigs = old_sigs.join(new_ids, "id", "left_anti").unionByName(
        sig_new.join(cand, "id", "left_semi")
    )
    return pair_est_jaccard(pairs, sigs, meta["num_hashes"])


def incremental_ngram_dedup(
    new_df: DataFrame,
    old_df: DataFrame,
    path: str,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.8,
    hot_bucket: int = 256,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Incremental blocking + EXACT shingle-Jaccard verify >= threshold:
    candidate pairs from the index probe, then
    ``dedup.exact_jaccard_pairs`` over old ∪ new pruned to candidate ids
    (broadcast semi-join — the old corpus is scanned once map-side-
    filtered, and the shingle UDF touches candidates only). ``old_df``
    must be the corpus the index at ``path`` was built from."""
    pairs = incremental_candidate_pairs(
        new_df,
        path,
        id_col,
        text_col,
        hot_bucket=hot_bucket,
        min_parallelism=min_parallelism,
    ).localCheckpoint(eager=True)
    corpus = old_df.select(
        F.col(id_col), F.col(text_col)
    ).unionByName(new_df.select(F.col(id_col), F.col(text_col)))
    scored = exact_jaccard_pairs(
        corpus,
        pairs,
        id_col,
        text_col,
        min_parallelism=min_parallelism,
    )
    return scored.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# Image twin: persisted 64-bit fingerprint (phash/simhash) chunk-band index
# ---------------------------------------------------------------------------

_PHASH_META_SCHEMA = "chunks int, max_hamming int, band_chunks int"


def _meta_band_chunks(meta) -> int:
    """band_chunks from an index meta row; pre-round-3 indexes lack the
    column and were banded on single chunks."""
    try:
        bc = meta["band_chunks"]
    except (KeyError, ValueError):
        return 1
    return 1 if bc is None else int(bc)


def save_phash_index(
    df: DataFrame,
    path: str,
    id_col: str = "image_id",
    phash_col: str = "phash",
    chunks: int = 4,
    max_hamming: int = 3,
) -> None:
    """Persist the accepted image corpus' phash chunk-band index:
    ``{path}/banded`` holds (val, id, h) hive-partitioned BY CHUNK
    (0..chunks-1), ``{path}/meta`` the banding parameters. Pigeonhole
    contract: Hamming ≤ ``max_hamming`` pairs share ≥ 1 chunk value
    when chunks > max_hamming, so a probe that joins on (chunk, val)
    has EXACT recall (same guarantee as ``dedup.hamming_near_dups``,
    persisted). The fingerprint rides in the member rows, so probes
    compute Hamming at pair time with zero re-joins. No UDF anywhere —
    banding is a native Column projection (one scan, map-only write).
    Appends: same ``ingest`` partition-label idempotence as the MinHash
    index."""
    from smcchecker_spark.ops.dedup import check_pigeonhole

    check_pigeonhole(max_hamming, chunks)
    spark = df.sparkSession
    # compound bands whenever the Hamming budget leaves >= 2 agreeing
    # chunks (same saturation argument as dedup.combo_band_structs: a
    # persisted 16-bit single-chunk index saturates around 10^7 images
    # and makes every probe quadratic); the combination size is part of
    # the index format and rides in meta
    band_chunks = max(1, chunks - max_hamming)
    spark.createDataFrame(
        [(chunks, max_hamming, band_chunks)], _PHASH_META_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    _banded_phash(df, id_col, phash_col, chunks, band_chunks).withColumn(
        "ingest", F.lit("base")
    ).write.mode("overwrite").partitionBy("ingest", "chunk").parquet(
        f"{path}/banded"
    )


def _banded_phash(
    df: DataFrame, id_col: str, phash_col: str, chunks: int,
    band_chunks: int = 1,
) -> DataFrame:
    from smcchecker_spark.ops.dedup import (
        chunk_band_structs, combo_band_structs,
    )

    h = F.col(phash_col).cast("long")
    bands = (
        combo_band_structs(h, chunks, band_chunks)
        if band_chunks >= 2
        else chunk_band_structs(h, chunks)
    )
    return df.select(
        F.col(id_col).alias("id"),
        h.alias("h"),
        F.explode(bands).alias("cc"),
    ).select(
        F.col("cc.chunk").alias("chunk"),
        F.col("cc.val").alias("val"),
        "id",
        "h",
    )


def append_to_phash_index(
    new_df: DataFrame,
    path: str,
    id_col: str = "image_id",
    phash_col: str = "phash",
    ingest_label: str | None = None,
) -> None:
    """Fold an accepted image batch into the index (see
    ``append_to_minhash_index`` for the idempotence contract)."""
    spark = new_df.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first()
    label = ingest_label if ingest_label is not None else "append"
    mode = "overwrite" if ingest_label is not None else "append"
    (
        _banded_phash(
            new_df, id_col, phash_col, meta["chunks"],
            _meta_band_chunks(meta),
        )
        .withColumn("ingest", F.lit(label))
        .write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest", "chunk")
        .parquet(f"{path}/banded")
    )


def incremental_phash_pairs(
    new_df: DataFrame,
    path: str,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int | None = None,
    hot_bucket: int = 256,
) -> DataFrame:
    """Near-duplicate IMAGE pairs touching the new batch:
    (id_a, id_b, hamming ≤ max_hamming) — new x new through the shared
    skew-guarded ``hamming_near_dups``, new x old against the STORED
    band index; old x old never re-pairs. Same plan discipline as the
    MinHash probe: the batch's distinct (chunk, val) keys broadcast
    semi-prune the index scan map-side, surviving old members group per
    bucket into chunked arrays (hot flat-image buckets spread across
    tasks), the batch's per-bucket members broadcast on. Recall is
    EXACT by pigeonhole for max_hamming ≤ the indexed bound."""
    from smcchecker_spark.ops.dedup import (
        check_pigeonhole,
        hamming_near_dups,
    )

    spark = new_df.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first()
    band_chunks = _meta_band_chunks(meta)
    if max_hamming is None:
        max_hamming = meta["max_hamming"]
    check_pigeonhole(max_hamming, meta["chunks"])
    if max_hamming > meta["chunks"] - band_chunks:
        raise ValueError(
            f"index banded on {band_chunks}-chunk combinations only "
            f"guarantees recall for max_hamming <= "
            f"{meta['chunks'] - band_chunks}; got {max_hamming} — "
            "rebuild the index with the looser bound"
        )

    banded_new = _banded_phash(
        new_df, id_col, phash_col, meta["chunks"], band_chunks
    ).localCheckpoint(eager=True)

    nn = hamming_near_dups(
        new_df.select(F.col(id_col).alias("id"), F.col(phash_col).alias("h")),
        "id",
        "h",
        max_hamming,
        meta["chunks"],
        hot_bucket,
    )

    old = spark.read.parquet(f"{path}/banded").select(
        "chunk", "val", "id", "h"
    )
    keys = banded_new.select("chunk", "val").distinct()
    grouped_old = (
        old.join(F.broadcast(keys), ["chunk", "val"], "left_semi")
        .groupBy("chunk", "val")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("id"), F.col("h")))
            ).alias("ms")
        )
    )
    old_chunks = _chunked_members(
        grouped_old, ["chunk", "val"], hot_bucket
    ).repartition("chunk", "val", "ci")
    new_chunks = F.broadcast(
        _chunked_members(
            banded_new.groupBy("chunk", "val").agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("id"), F.col("h")))
                ).alias("ms")
            ),
            ["chunk", "val"],
            hot_bucket,
            idx_name="nj",
            arr_name="na",
        )
    )
    on = (
        old_chunks.join(new_chunks, ["chunk", "val"])
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ca"),
                        lambda o: F.transform(
                            F.col("na"),
                            lambda n: F.struct(o.alias("o"), n.alias("n")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.o", "p.n")
    )
    a_first = F.col("o") < F.col("n")
    no = on.select(
        F.when(a_first, F.col("o.id")).otherwise(F.col("n.id")).alias("id_a"),
        F.when(a_first, F.col("n.id")).otherwise(F.col("o.id")).alias("id_b"),
        F.bit_count(
            F.col("o.h").bitwiseXOR(F.col("n.h"))
        ).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
    return nn.unionByName(no).dropDuplicates(["id_a", "id_b"])
