"""2M-document soak of the training-data pipeline ops.

Generates a deterministic synthetic corpus (JVM-side expressions only —
no Python in the generator) once to parquet, then times each pipeline
op end-to-end at a pinned core budget, printing one JSON line:

    taskset -c 0-7 python tools/soak_pipeline.py

Corpus shape: ~64-token docs assembled from 64 literal 8-word phrases
chosen by xxhash64(doc_id, slot) — heavy phrase reuse (realistic shingle
overlap and repetition variance), ~1/37 docs carry a planted email,
~1/101 docs form the "benchmark" set for decontamination.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SOAK_DOCS", "2000000"))
CORES = int(os.environ.get("SOAK_CORES", "8"))
DIR = f"/tmp/soak_docs_{N_DOCS}.parquet"

_WORDS = [
    "the", "data", "spark", "model", "train", "batch", "shuffle", "join",
    "scan", "merge", "token", "image", "text", "hash", "bucket", "row",
]


def _phrases() -> list[str]:
    out = []
    for i in range(64):
        ws = [_WORDS[(i * 7 + j * 3 + (i >> 2) * j) % len(_WORDS)] for j in range(8)]
        out.append(" ".join(ws))
    return out


def _generate(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(DIR):
        return
    phrases = F.array(*[F.lit(p) for p in _phrases()])
    slots = [
        F.element_at(phrases, (F.pmod(F.xxhash64(F.col("id"), F.lit(s)), 64) + 1).cast("int"))
        for s in range(8)
    ]
    text = F.concat_ws(" ", *slots)
    text = F.when(
        F.col("id") % 37 == 0,
        F.concat(text, F.lit(" contact u"), F.col("id").cast("string"), F.lit("@x.com")),
    ).otherwise(text)
    df = (
        spark.range(0, N_DOCS, 1, CORES * 8)
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.length(text).alias("n_chars"),
        )
    )
    df.write.mode("overwrite").parquet(DIR + ".tmp")
    os.rename(DIR + ".tmp", DIR)


def main() -> None:
    from pyspark.sql import functions as F

    from smcchecker_spark import clean
    from smcchecker_spark.ops import contamination as CT
    from smcchecker_spark.ops import pack
    from smcchecker_spark.ops import sample as S
    from smcchecker_spark.ops import text as T
    from smcchecker_spark.session import get_spark

    spark = get_spark("soak-pipeline", cores=CORES)
    _generate(spark)
    docs = spark.read.parquet(DIR)
    results: dict[str, dict] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        el = time.time() - t0
        results[name] = {
            "sec": round(el, 2),
            "docs_per_sec": round(N_DOCS / el, 0),
            "result": out,
        }
        print(f"{name}: {el:.2f}s ({N_DOCS / el:,.0f} docs/s) -> {out}",
              file=sys.stderr, flush=True)

    timed("det_split", lambda: {
        r["split"]: r["count"]
        for r in S.det_split(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
        .groupBy("split").count().collect()
    })
    timed("repetition_features", lambda: {
        k: round(v, 4)
        for k, v in T.repetition_features(docs)
        .agg(F.avg("dup_word_frac").alias("avg_dup"),
             F.avg("top_word_frac").alias("avg_top"))
        .first().asDict().items()
    })
    timed("scrub_pii", lambda: {
        "redactions": clean.scrub_pii(docs)
        .agg(F.sum("n_email").cast("long").alias("n")).first()["n"]
    })
    bench = docs.filter(F.col("doc_id") % 101 == 0)
    timed("contamination_score", lambda: {
        "contaminated": CT.shingle_overlap(docs, bench, "doc_id")
        .filter(F.col("n_hits") > 0).count()
    })
    timed("pack_sequences", lambda: {
        "bins": pack.pack_sequences(docs, "doc_id", "n_chars", capacity=8192)
        .agg(F.max("bin_id").alias("b")).first()["b"] + 1
    })
    timed("budget_mix_sample", lambda: {
        "kept": S.budget_mix_sample(
            docs.withColumn("src", (F.col("doc_id") % 4).cast("string")),
            "doc_id", "src", "n_chars",
            {"0": 0.4, "1": 0.3, "2": 0.2, "3": 0.1},
            budget=2e8,
        ).count()
    })
    # round-4: exact substring-span dedup in its ADVERSARIAL regime —
    # the phrase-assembled corpus duplicates essentially every 8-token
    # window (64 phrase interiors + ~28k straddle texts across 114M
    # positions), so the candidate "sliver" is the whole corpus and the
    # text-confirm + keeper-rank stages run at full width. Real corpora
    # sit far below this dup rate; this bounds the worst case.
    timed("dedup_substring_spans", lambda: {
        "spanned_docs": __import__(
            "smcchecker_spark.ops.substrings", fromlist=["x"]
        ).duplicate_substring_spans(docs, window=8)
        .select("doc_id").distinct().count()
    })
    # --- round-2 additions: chunking, capping, weighted sampling,
    # map-side top-k, bloom prefilter — all at the full 2M scale ---
    timed("chunk_documents", lambda: {
        "chunks": T.chunk_documents(
            docs, "doc_id", chunk_tokens=32, overlap_tokens=4
        ).count()
    })
    # heavy-tailed synthetic domain: one hot key holding 2% of the corpus
    domains = docs.withColumn(
        "src",
        F.when(F.col("doc_id") % 50 == 0, F.lit("hot")).otherwise(
            F.concat(F.lit("s"), (F.col("doc_id") % 1000).cast("string"))
        ),
    )
    timed("cap_per_key", lambda: {
        "kept": S.cap_per_key(domains, "doc_id", "src", cap=500).count()
    })
    timed("weighted_sample_per_key", lambda: {
        "kept": S.weighted_sample_per_key(
            domains, "doc_id", "src", "n_chars", k=200
        ).count()
    })
    timed("topk_per_key", lambda: {
        "rows": __import__(
            "smcchecker_spark.ops.topk", fromlist=["topk_per_key"]
        ).topk_per_key(domains, "src", "n_chars", "doc_id", k=5).count()
    })
    timed("bloom_prefilter_anti", lambda: {
        "not_in": __import__(
            "smcchecker_spark.ops.bloom", fromlist=["prefilter_anti_join"]
        ).prefilter_anti_join(
            docs.select("doc_id"),
            "doc_id",
            docs.filter(F.col("doc_id") % 3 == 0).select("doc_id"),
            num_bits=1 << 24,
        ).count()
    })
    print(json.dumps({"n_docs": N_DOCS, "cores": CORES, "ops": results}))
    spark.stop()


if __name__ == "__main__":
    main()
