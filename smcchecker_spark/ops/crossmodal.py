"""Cross-modal consistency for image+caption corpora.

Two curation signals LAION-style web-scraped pair tables need before
training (beyond the reference's single-table checks — task-brief
"training-data pipeline" layer):

- **boilerplate captions**: one caption attached to MANY distinct
  images ("stock photo", alt-text templates) carries no alignment
  signal and poisons contrastive training;
- **conflicting images**: one image (same perceptual hash) attached to
  MANY distinct captions is label noise — re-hosted images with
  unrelated alt text.

Plan shape at 10^12 pairs: ONE scan projects (caption_fp, phash), one
groupBy on the PAIR collapses duplicates map-side (the boilerplate
caption that appears 10^8 times with the same image folds inside each
task before any shuffle), and both rollups aggregate that already-tiny
pair table — so the corpus shuffles once, by the pair key, and the hot
single-key aggregations happen on counts, not rows. Per-row flags come
back through broadcast joins of the two flagged slivers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def caption_fingerprint(col: Column) -> Column:
    """Canonical caption identity: md5 of the lowercased,
    whitespace-collapsed text — byte-identical captions that differ only
    in case/spacing are the same boilerplate. Portable (md5, not
    xxhash64) so SQL engines can audit assignments."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(norm)


def pair_counts(
    df: DataFrame, caption_col: str = "caption", phash_col: str = "phash"
) -> DataFrame:
    """(caption_fp, phash, n_rows): the deduplicated pair table both
    rollups aggregate. NULL captions/phashes are excluded — they carry
    no cross-modal signal (NotNull is where they get flagged)."""
    return (
        df.filter(F.col(caption_col).isNotNull() & F.col(phash_col).isNotNull())
        .select(
            caption_fingerprint(F.col(caption_col)).alias("caption_fp"),
            F.col(phash_col).alias("phash"),
        )
        .groupBy("caption_fp", "phash")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def caption_stats(
    df: DataFrame, caption_col: str = "caption", phash_col: str = "phash"
) -> DataFrame:
    """(caption_fp, n_rows, n_phashes) per distinct caption — the
    boilerplate-caption detector's input. Aggregates the pair table, so
    a boilerplate caption is a hot key over COUNTS (bounded by its
    distinct-image fan-out), never over raw rows."""
    return pair_counts(df, caption_col, phash_col).groupBy("caption_fp").agg(
        F.sum("n_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_phashes"),
    )


def phash_stats(
    df: DataFrame, caption_col: str = "caption", phash_col: str = "phash"
) -> DataFrame:
    """(phash, n_rows, n_captions) per distinct image hash — the
    conflicting-image detector's input."""
    return pair_counts(df, caption_col, phash_col).groupBy("phash").agg(
        F.sum("n_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_captions"),
    )


def flag_crossmodal(
    df: DataFrame,
    id_col: str,
    caption_col: str = "caption",
    phash_col: str = "phash",
    max_phashes_per_caption: int = 100,
    max_captions_per_phash: int = 5,
) -> DataFrame:
    """Per-row curation flags: (id, boilerplate_caption,
    conflicting_image) for every non-NULL pair row.

    The two flagged sets are slivers by construction (groups EXCEEDING
    the thresholds), so they come back as broadcast left joins — the
    corpus is scanned twice (once for the pair agg, once to attach
    flags) and never shuffled on the attach. One pair_counts plan feeds
    both rollups; Spark reuses its exchange across the two aggregations.
    """
    pair = pair_counts(df, caption_col, phash_col)
    bad_caps = F.broadcast(
        pair.groupBy("caption_fp")
        .agg(F.count(F.lit(1)).alias("n_phashes"))
        .filter(F.col("n_phashes") > max_phashes_per_caption)
        .select("caption_fp", F.lit(True).alias("__bp"))
    )
    bad_imgs = F.broadcast(
        pair.groupBy("phash")
        .agg(F.count(F.lit(1)).alias("n_captions"))
        .filter(F.col("n_captions") > max_captions_per_phash)
        .select(F.col("phash").alias("__ph"), F.lit(True).alias("__cf"))
    )
    base = df.filter(
        F.col(caption_col).isNotNull() & F.col(phash_col).isNotNull()
    ).select(
        F.col(id_col),
        caption_fingerprint(F.col(caption_col)).alias("caption_fp"),
        F.col(phash_col).alias("phash"),
    )
    return (
        base.join(bad_caps, "caption_fp", "left")
        .join(bad_imgs, base["phash"] == F.col("__ph"), "left")
        .select(
            id_col,
            F.coalesce(F.col("__bp"), F.lit(False)).alias(
                "boilerplate_caption"
            ),
            F.coalesce(F.col("__cf"), F.lit(False)).alias(
                "conflicting_image"
            ),
        )
    )
