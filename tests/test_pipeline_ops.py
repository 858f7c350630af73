"""Tests for the training-data pipeline ops: deterministic sampling /
splits (ops/sample.py), sequence packing (ops/pack.py), and benchmark
decontamination (ops/contamination.py)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from smcchecker_spark.ops import contamination as CT
from smcchecker_spark.ops import pack
from smcchecker_spark.ops import sample as S


# ---------------------------------------------------------------------------
# ops/sample.py
# ---------------------------------------------------------------------------


def test_det_split_covers_every_row_and_is_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = S.det_split(df, "doc_id", fr).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in out}
    assert sum(counts.values()) == 2000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # shares within a loose tolerance (hash uniformity, n=2000)
    assert abs(counts["train"] / 2000 - 0.8) < 0.05

    # partitioning-independence: same labels at 1 and 7 partitions
    a = S.det_split(df.coalesce(1), "doc_id", fr).collect()
    b = S.det_split(df.repartition(7), "doc_id", fr).collect()
    assert {(r["doc_id"], r["split"]) for r in a} == {
        (r["doc_id"], r["split"]) for r in b
    }


def test_det_split_validates_fractions(spark):
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        S.det_split(df, "doc_id", {"a": 0.5, "b": 0.4})


def test_hash_sample_nested_and_disjoint_by_salt(spark):
    df = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    q = {r["doc_id"] for r in S.hash_sample(df, "doc_id", 0.25).collect()}
    h = {r["doc_id"] for r in S.hash_sample(df, "doc_id", 0.5).collect()}
    # same salt → samples are NESTED (bucket < t1 ⊂ bucket < t2): growing
    # the sample keeps everything already selected — resume-friendly
    assert q <= h
    assert abs(len(h) / 3000 - 0.5) < 0.04
    # different salt → decorrelated selection
    other = {r["doc_id"] for r in S.hash_sample(df, "doc_id", 0.5, salt="x").collect()}
    overlap = len(h & other) / 3000
    assert 0.15 < overlap < 0.35  # ~0.25 if independent


def test_hash_sample_is_map_only(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = S.hash_sample(df, "doc_id", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_hash_sample_per_stratum(spark):
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 2).cast("string").alias("s")
    )
    out = S.stratified_hash_sample(df, "doc_id", "s", {"0": 0.5, "1": 0.1})
    counts = {r["s"]: r["count"] for r in out.groupBy("s").count().collect()}
    assert abs(counts["0"] / 2000 - 0.5) < 0.06
    assert abs(counts["1"] / 2000 - 0.1) < 0.04
    # unlisted strata default to 0 kept
    df2 = df.withColumn("s", F.lit("zz"))
    assert S.stratified_hash_sample(df2, "doc_id", "s", {"0": 0.5}).count() == 0


def test_budget_mix_sample_hits_target_weights(spark):
    # two strata, weight 10 per row → totals a=10000, b=5000
    df = spark.range(0, 1500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, "a").otherwise("b").alias("src"),
        F.lit(10).alias("w"),
    )
    out = S.budget_mix_sample(
        df, "doc_id", "src", "w", {"a": 0.5, "b": 0.5}, budget=6000.0
    )
    got = {
        r["src"]: r["t"]
        for r in out.groupBy("src").agg(F.sum("w").alias("t")).collect()
    }
    # each stratum should contribute ~3000 weight (0.5 × 6000)
    assert abs(got["a"] - 3000) / 3000 < 0.15
    assert abs(got["b"] - 3000) / 3000 < 0.15
    # oversubscribed stratum keeps everything instead of upsampling
    out2 = S.budget_mix_sample(
        df, "doc_id", "src", "w", {"b": 1.0}, budget=1_000_000.0
    )
    assert out2.filter(F.col("src") == "b").count() == 500
    assert out2.filter(F.col("src") == "a").count() == 0


# ---------------------------------------------------------------------------
# ops/pack.py
# ---------------------------------------------------------------------------


def _single_window_reference(df, order_col, size_col, capacity):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    start = F.coalesce(
        F.sum(F.coalesce(F.col(size_col).cast("long"), F.lit(0))).over(w), F.lit(0)
    )
    return df.select(
        order_col,
        F.floor(start / capacity).cast("long").alias("bin_id"),
        start.cast("long").alias("bin_offset"),
    )


def test_pack_matches_single_window_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: (r["bin_id"], r["bin_offset"])
        for r in pack.pack_sequences(
            docs, "doc_id", "n_chars", 4096, num_ranges=8
        ).select("doc_id", "bin_id", "bin_offset").collect()
    }
    exp = {
        r["doc_id"]: (r["bin_id"], r["bin_offset"])
        for r in _single_window_reference(docs, "doc_id", "n_chars", 4096).collect()
    }
    assert got == exp


def test_pack_invariant_to_range_count(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 97 + 1).alias("sz")
    )
    ref = None
    for p in (1, 3, 16):
        got = sorted(
            (r["k"], r["bin_id"], r["bin_offset"])
            for r in pack.pack_sequences(df, "k", "sz", 256, num_ranges=p).collect()
        )
        if ref is None:
            ref = got
        else:
            assert got == ref


def test_pack_no_single_partition_exchange(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), F.lit(7).alias("sz")
    )
    packed = pack.pack_sequences(df, "k", "sz", 64, num_ranges=8)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_pack_null_sizes_and_oversized_rows(spark):
    rows = [(1, None), (2, 50), (3, 500), (4, 10)]  # capacity 100; row 3 straddles
    df = spark.createDataFrame(rows, "k int, sz int")
    got = {
        r["k"]: (r["bin_id"], r["bin_offset"])
        for r in pack.pack_sequences(df, "k", "sz", 100, num_ranges=2).collect()
    }
    # starts: k1@0, k2@0, k3@50, k4@550
    assert got == {1: (0, 0), 2: (0, 0), 3: (0, 50), 4: (5, 550)}
    with pytest.raises(ValueError):
        pack.pack_sequences(df, "k", "sz", 0)


def test_bin_fill_stats(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(10).alias("sz"))
    packed = pack.pack_sequences(df, "k", "sz", 50, num_ranges=4)
    stats = pack.bin_fill_stats(packed, "sz", capacity=50).collect()
    assert all(r["n_docs"] == 5 and r["total_size"] == 50 and r["fill"] == 1.0
               for r in stats)
    assert len(stats) == 20


# ---------------------------------------------------------------------------
# ops/contamination.py
# ---------------------------------------------------------------------------


def test_shingle_overlap_planted(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),     # shares 'alpha beta gamma'
            (2, "zeta eta theta iota kappa"),          # no overlap
            (3, ""),                                   # empty → 0, survives
            (4, "alpha beta gamma"),                   # the full bench doc
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame([(99, "alpha beta gamma")], "doc_id int, text string")
    got = {r["id"]: (r["n_hits"], r["overlap"])
           for r in CT.shingle_overlap(docs, bench, "doc_id").collect()}
    assert got[1][0] == 1 and got[1][1] > 0
    assert got[2] == (0, 0.0)
    assert got[3] == (0, 0.0)
    assert got[4] == (1, 1.0)


def test_decontaminate_drops_only_hits(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y z w v"), (3, "")],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame([(9, "a b c")], "doc_id int, text string")
    kept = {r["doc_id"] for r in CT.decontaminate(docs, bench, "doc_id").collect()}
    assert kept == {2, 3}


def test_shingle_overlap_shuffle_fallback_parity(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(40)],
        "doc_id int, text string",
    )
    bench = docs.filter(F.col("doc_id") % 5 == 0)
    a = sorted(map(tuple, CT.shingle_overlap(docs, bench, "doc_id").collect()))
    b = sorted(map(tuple, CT.shingle_overlap(
        docs, bench, "doc_id", broadcast_bench=False).collect()))
    assert a == b


def test_empty_bench_contaminates_nothing(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id int, text string")
    bench = spark.createDataFrame([(9, "")], "doc_id int, text string")
    got = CT.shingle_overlap(docs, bench, "doc_id").collect()
    assert got[0]["n_hits"] == 0
    assert CT.decontaminate(docs, bench, "doc_id").count() == 1


# ---------------------------------------------------------------------------
# clean.py PII scrubbing
# ---------------------------------------------------------------------------


def test_scrub_pii_planted(spark):
    from smcchecker_spark import clean

    rows = [
        (1, "mail bob+x@ex.org now"),
        (2, "ip 8.8.8.8 and phone +44 (0) 7911-123456"),
        (3, None),
        (4, "clean row"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r["id"]: r for r in clean.scrub_pii(df).collect()}
    assert got[1]["text"] == "mail <email> now" and got[1]["n_email"] == 1
    assert "<ipv4>" in got[2]["text"] and "<phone>" in got[2]["text"]
    # progressive counts: the IP's digits are NOT double-counted as phone
    assert got[2]["n_ipv4"] == 1 and got[2]["n_phone"] == 1
    assert got[3]["text"] == "" and got[4]["text"] == "clean row"


def test_scrub_pii_map_only_and_idempotent(spark):
    from smcchecker_spark import clean

    df = spark.createDataFrame([(1, "a@b.co x 192.168.1.1")], "id int, text string")
    out = clean.scrub_pii(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "ArrowEvalPython" not in plan
    # placeholders don't re-match: scrubbing twice is a fixpoint
    once = out.select("id", "text")
    twice = clean.scrub_pii(once).select("id", "text")
    assert once.collect() == twice.collect()


# ---------------------------------------------------------------------------
# property tests (hypothesis): pack + split invariants
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=60),
    capacity=st.integers(min_value=1, max_value=200),
    ranges=st.integers(min_value=1, max_value=5),
)
def test_pack_property_prefix_sum(sizes, capacity, ranges):
    spark = _SPARK[0]
    rows = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "k int, sz int")
    got = {
        r["k"]: (r["bin_id"], r["bin_offset"])
        for r in pack.pack_sequences(df, "k", "sz", capacity, num_ranges=ranges).collect()
    }
    run = 0
    for i, s in enumerate(sizes):
        assert got[i] == (run // capacity, run)
        run += s


@settings(max_examples=8, deadline=None)
@given(
    fr=st.floats(min_value=0.0, max_value=1.0),
    salt=st.text(alphabet="abcxyz", max_size=4),
)
def test_hash_sample_property_deterministic_subset(fr, salt):
    spark = _SPARK[0]
    df = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in S.hash_sample(df, "doc_id", fr, salt).collect()}
    b = {r["doc_id"] for r in S.hash_sample(df, "doc_id", fr, salt).collect()}
    assert a == b                       # pure function of content
    if fr == 1.0:
        assert len(a) == 400
    smaller = {r["doc_id"] for r in S.hash_sample(df, "doc_id", fr / 2, salt).collect()}
    assert smaller <= a                 # nested thresholds


_SPARK = [None]


@pytest.fixture(autouse=True)
def _capture_spark(spark):
    _SPARK[0] = spark
    yield


def test_unicode_whitespace_tokenizer_parity(spark):
    """Benchmark and corpus sides must tokenize IDENTICALLY: a verbatim
    eval doc containing a non-breaking space (Unicode whitespace that
    Java's \\s+ does NOT split on) must still fully contaminate its copy
    in the corpus. Regression: benchmark_shingles used the Column
    shingler (ASCII \\s+) while the corpus used the Arrow shingler
    (Python str.split, Unicode-aware), so the two sides produced
    disjoint shingle sets for this exact text."""
    text = "foo bar baz qux quux"
    docs = spark.createDataFrame([(1, text)], "doc_id int, text string")
    bench = spark.createDataFrame([(9, text)], "doc_id int, text string")
    got = CT.shingle_overlap(docs, bench, "doc_id").collect()[0]
    assert got["overlap"] == 1.0
    kept = CT.decontaminate(docs, bench, "doc_id").count()
    assert kept == 0


def test_decontaminate_shuffle_flagged_parity(spark):
    """broadcast_flagged=False (the high-overlap regime escape hatch)
    keeps the exact same survivor set."""
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} common common common") for i in range(20)],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(9, "common common common")], "doc_id int, text string"
    )
    a = {r["doc_id"] for r in CT.decontaminate(docs, bench, "doc_id").collect()}
    b = {r["doc_id"] for r in CT.decontaminate(
        docs, bench, "doc_id", broadcast_flagged=False).collect()}
    assert a == b


def test_phone_pattern_spares_ordinary_numeric_text(spark):
    """Regression: the earlier catch-all [\\d\\s().-]{7,} phone pattern
    redacted ISO timestamps, adjacent decimals, and digit runs spanning
    newlines. The structured pattern must leave those intact while still
    catching real phone shapes."""
    rows = [
        (1, "released 2024-01-02 03:04, values 3.14159 2.71828"),
        (2, "range 100-200 and 3000-4000 ts 1787039051"),
        (3, "line one 2024-01-02\n03:04 line two"),
        (4, "call +1 555-000-1234 or (555) 123-4567 or 555.123.4567"),
        (5, "ISBN 978-3-16-148410-0 and card 4111 1111 1111 1111"),
    ]
    from smcchecker_spark import clean

    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in clean.scrub_pii(df).collect()}
    for i in (1, 2, 3, 5):
        assert got[i]["n_phone"] == 0, got[i]["text"]
        assert got[i]["text"] == rows[i - 1][1]
    assert got[4]["n_phone"] == 3
    assert got[4]["text"].count("<phone>") == 3


def test_budget_mix_null_weight_stratum_fails_loudly(spark):
    """A targeted stratum whose weight column is entirely NULL must raise,
    not silently vanish from the mix (fraction 0)."""
    rows = [(1, "web", None), (2, "web", None), (3, "code", 100)]
    df = spark.createDataFrame(rows, "doc_id int, source string, n_tokens int")
    with pytest.raises(ValueError, match="web"):
        S.budget_mix_sample(
            df, "doc_id", "source", "n_tokens",
            {"web": 0.5, "code": 0.5}, budget=100,
        )


def test_suggest_image_policy_empty_snapshot_fails_loudly(spark):
    """An empty (or all-NULL-dims) snapshot has no envelope to profile —
    ValueError with the aggregates, not a TypeError from int(None)."""
    import pytest as _pytest

    from smcchecker_spark.image import suggest_image_policy

    empty = spark.createDataFrame(
        [], "image_id string, bytes binary, w int, h int"
    )
    with _pytest.raises(ValueError, match="non-empty snapshot"):
        suggest_image_policy(empty)


# ---------------------------------------------------------------- batching

from smcchecker_spark.ops import batching as B


def test_generate_aspect_buckets_pin():
    """The default bucket list is pinned — the image_batches_events
    DuckDB oracle embeds exactly these literals, so a silent change here
    would break the value oracle without failing any unit test."""
    assert B.generate_aspect_buckets() == [
        (256, 832), (256, 896), (256, 960), (256, 1024), (320, 704),
        (320, 768), (384, 640), (448, 576), (512, 512), (576, 448),
        (640, 384), (704, 320), (768, 320), (832, 256), (896, 256),
        (960, 256), (1024, 256),
    ]
    # transpose closure: every (w, h) has its (h, w)
    bl = set(B.generate_aspect_buckets(max_area=640 * 640))
    assert all((h, w) in bl for (w, h) in bl)
    with pytest.raises(ValueError, match="multiples"):
        B.generate_aspect_buckets(min_side=100)


def test_assign_aspect_bucket_nearest_and_ties(spark):
    """Square → (512,512); extreme tall → the tallest bucket; an exact
    AR tie between two buckets goes to the LOWER index (struct argmin
    tie rule — the rule the SQL oracle reproduces)."""
    df = spark.createDataFrame(
        [(1, 500, 500), (2, 100, 400), (3, 2000, 2000)],
        "image_id int, w int, h int",
    )
    got = {
        r["image_id"]: (r["bucket_w"], r["bucket_h"])
        for r in B.assign_aspect_bucket(df).collect()
    }
    assert got[1] == (512, 512)
    assert got[2] == (256, 1024)
    assert got[3] == (512, 512)
    # tie: buckets (1,2) and (2,4) have identical AR 0.5; lower index wins
    tie = B.assign_aspect_bucket(
        spark.createDataFrame([(1, 50, 100)], "image_id int, w int, h int"),
        buckets=[(2, 4), (1, 2)],
    ).collect()[0]
    assert (tie["bucket_w"], tie["bucket_h"]) == (2, 4)
    with pytest.raises(ValueError, match="empty"):
        B.assign_aspect_bucket(df, buckets=[])


def test_image_batches_partition_invariant(spark):
    """batch/idx assignment is a pure function of (id, salt, buckets,
    batch_size): repartitioning the input and changing num_ranges must
    not move a single row."""
    df = spark.createDataFrame(
        [(i, 64 * (1 + i % 5), 64 * (1 + (i // 3) % 5)) for i in range(300)],
        "image_id long, w int, h int",
    )
    cols = ["image_id", "bucket_id", "batch_id", "idx_in_batch"]

    def run(d, nr):
        return {
            tuple(r[c] for c in cols)
            for r in B.image_batches(d, batch_size=16, num_ranges=nr).collect()
        }

    assert run(df, 8) == run(df.repartition(13), 3)


def test_image_batches_shapes_and_drop_partial(spark):
    """Every batch holds ≤ batch_size rows, idx_in_batch enumerates
    0..n-1 within its batch, and drop_partial keeps exactly the full
    batches of every bucket."""
    df = spark.createDataFrame(
        [(i, 64 * (1 + i % 7), 64 * (1 + (i // 5) % 7)) for i in range(500)],
        "image_id long, w int, h int",
    )
    rows = B.image_batches(df, batch_size=32).collect()
    assert len(rows) == 500
    by_batch: dict[tuple, list] = {}
    for r in rows:
        by_batch.setdefault((r["bucket_id"], r["batch_id"]), []).append(
            r["idx_in_batch"]
        )
    for idxs in by_batch.values():
        assert sorted(idxs) == list(range(len(idxs)))
        assert len(idxs) <= 32
    kept = B.image_batches(df, batch_size=32, drop_partial=True).collect()
    full = {k for k, v in by_batch.items() if len(v) == 32}
    assert len(kept) == 32 * len(full)
    assert {(r["bucket_id"], r["batch_id"]) for r in kept} == full
    with pytest.raises(ValueError, match="batch_size"):
        B.image_batches(df, batch_size=0)


# ------------------------------------------------------------- quantization

def test_quantize_roundtrip_error_bound(spark):
    from smcchecker_spark.ops import quant

    df = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: F.sin(F.col("id") * 0.7 + i * 1.3) * 3.5,
        ).alias("embedding"),
    )
    q = quant.quantize_embeddings(df)
    rows = q.select(
        "vec_id", "q_scale",
        quant.max_abs_error_expr(
            F.col("embedding"), F.col("q"), F.col("q_scale")
        ).alias("err"),
        F.array_max(F.transform("q", lambda x: F.abs(x))).alias("qmax"),
    ).collect()
    assert len(rows) == 200
    for r in rows:
        # per-element reconstruction error <= scale/2 (round-to-nearest)
        assert r["err"] <= r["q_scale"] / 2 + 1e-12, r
        assert r["qmax"] <= 127
    # all-zero vector: eps floor, zeros out, zero error
    z = quant.quantize_embeddings(
        spark.createDataFrame([(1, [0.0, 0.0])], "vec_id int, embedding array<double>")
    ).collect()[0]
    assert list(z["q"]) == [0, 0] and z["q_scale"] == 1e-12


def test_quantized_cosine_close_and_scale_free(spark):
    """Scales cancel: quantized cosine from the int8 arrays tracks the
    float cosine within the quantization-noise bound (~1.5/127)."""
    from smcchecker_spark.ops import quant
    from smcchecker_spark.ops.similarity import cosine as fcos

    df = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(31)),
            lambda i: F.cos(F.col("id") * 1.1 + i * 0.37) * 2.0,
        ).alias("embedding"),
    )
    q = quant.quantize_embeddings(df)
    a = q.alias("a"); b = q.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        fcos(F.col("a.embedding"), F.col("b.embedding")).alias("fc"),
        quant.quantized_cosine(F.col("a.q"), F.col("b.q")).alias("qc"),
    )
    mx = pairs.agg(F.max(F.abs(F.col("fc") - F.col("qc")))).collect()[0][0]
    assert mx < 0.02, mx


def test_quantized_topk_matches_float_ranking(spark):
    """Quantized brute-force top-k: same contract as brute_force_topk;
    at 16-dim well-separated vectors the int8 ranking matches the float
    ranking's top-3 exactly."""
    from smcchecker_spark.ops import quant
    from smcchecker_spark.ops import similarity as sim

    corpus = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: F.cos(F.col("id") * 0.9 + i * 0.31) * 2.0,
        ).alias("embedding"),
    )
    queries = corpus.filter(F.col("vec_id").isin([3, 17])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qc = quant.quantize_embeddings(corpus)
    qq = quant.quantize_embeddings(
        queries.withColumnRenamed("query_id", "vec_id")
    ).withColumnRenamed("vec_id", "query_id")
    got = quant.quantized_topk(qc, qq, k=3).collect()
    want = sim.brute_force_topk(corpus, queries, k=3).collect()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in rows)
    assert key(got) == key(want)


# ---------------------------------------------------------------------------
# ops/sample.py — cap_per_key (domain balancing)
# ---------------------------------------------------------------------------


def _cap_fixture(spark):
    # one hot key (300 rows), several small keys (<= cap) — the shape
    # cap_per_key's skew split is built for
    rows = [(i, "hot") for i in range(300)]
    rows += [(1000 + i, "a") for i in range(3)]
    rows += [(2000 + i, "b") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_cap_per_key_exact_semantics(spark):
    df = _cap_fixture(spark)
    out = S.cap_per_key(df, "doc_id", "source", cap=5)
    got = {(r["doc_id"], r["source"]) for r in out.collect()}
    # small keys pass wholesale
    assert {(d, s) for (d, s) in got if s == "a"} == {(1000 + i, "a") for i in range(3)}
    assert {(d, s) for (d, s) in got if s == "b"} == {(2000 + i, "b") for i in range(5)}
    # hot key: exactly cap rows, and exactly the 5 smallest by
    # (hash_bucket, id) — the documented deterministic order
    hot = sorted(d for (d, s) in got if s == "hot")
    assert len(hot) == 5
    ranked = (
        df.filter(F.col("source") == "hot")
        .select("doc_id", S.hash_bucket(F.col("doc_id"), "cap").alias("b"))
        .collect()
    )
    expect = sorted(
        (r["doc_id"] for r in ranked),
        key=lambda d: (next(r["b"] for r in ranked if r["doc_id"] == d), d),
    )[:5]
    assert hot == sorted(expect)
    # partitioning-independence
    again = {
        (r["doc_id"], r["source"])
        for r in S.cap_per_key(df.repartition(7), "doc_id", "source", 5).collect()
    }
    assert again == got


def test_cap_per_key_threshold_mode(spark):
    df = _cap_fixture(spark)
    out = S.cap_per_key(df, "doc_id", "source", cap=50, exact=False)
    counts = {
        r["source"]: r["count"]
        for r in out.groupBy("source").count().collect()
    }
    # small keys keep everything; the hot key lands near the cap
    # (binomial: 300 draws at p=50/300 → sd ~6.5; 4 sd bound)
    assert counts["a"] == 3 and counts["b"] == 5
    assert abs(counts["hot"] - 50) < 27
    # only the order-free count window — no ranking sort anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan


def test_cap_per_key_validates_cap(spark):
    df = _cap_fixture(spark)
    with pytest.raises(ValueError):
        S.cap_per_key(df, "doc_id", "source", 0)


# ---------------------------------------------------------------------------
# ops/text.py — chunk_documents
# ---------------------------------------------------------------------------


def test_chunk_documents_covers_and_overlaps(spark):
    from smcchecker_spark.ops import text as T

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "a b"),
         (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = T.chunk_documents(df, "doc_id", chunk_tokens=4, overlap_tokens=1)
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["chunk_tokens"])
        for r in out.collect()
    )
    assert rows == [
        (1, 0, "w0 w1 w2 w3", 4),
        (1, 1, "w3 w4 w5 w6", 4),
        (1, 2, "w6 w7 w8 w9", 4),
        (2, 0, "a b", 2),
    ]
    # every token appears in some chunk (coverage), consecutive chunks
    # share exactly `overlap` tokens, empty/null docs emit nothing
    toks = set()
    for _, _, txt, _ in rows[:3]:
        toks.update(txt.split())
    assert toks == {f"w{i}" for i in range(10)}

    # map-only: no exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]


def test_chunk_documents_validates_overlap(spark):
    from smcchecker_spark.ops import text as T

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        T.chunk_documents(df, "doc_id", chunk_tokens=4, overlap_tokens=4)


def test_cap_per_key_single_scan_single_exchange(spark, tmp_path):
    # parquet source so scans are countable; both branches (wholesale +
    # ranked) must share ONE scan and ONE hash exchange via ReuseExchange
    _cap_fixture(spark).write.parquet(str(tmp_path / "d"))
    df = spark.read.parquet(str(tmp_path / "d"))
    out = S.cap_per_key(df, "doc_id", "source", cap=5)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    import re
    assert len(re.findall(r"Scan parquet", plan)) == 1
    real = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "ReusedExchange" not in ln
    ]
    assert len(real) == 1 and "ReusedExchange" in plan


# ---------------------------------------------------------------------------
# ops/sample.py — weighted_sample_per_key
# ---------------------------------------------------------------------------


def test_weighted_sample_per_key_semantics(spark):
    rows = [(i, "a", 1.0 if i < 400 else 100.0) for i in range(500)]
    rows += [(1000 + i, "b", 1.0) for i in range(3)]
    rows += [(2000, "c", None), (2001, "c", -1.0), (2002, "c", 2.0)]
    df = spark.createDataFrame(rows, "doc_id long, key string, w double")

    out = S.weighted_sample_per_key(df, "doc_id", "key", "w", k=50)
    got = [(r["doc_id"], r["key"]) for r in out.collect()]
    by_key = {}
    for d, kk in got:
        by_key.setdefault(kk, []).append(d)
    # exactly k for the oversized key; wholesale for small keys;
    # null/non-positive weights excluded
    assert len(by_key["a"]) == 50
    assert sorted(by_key["b"]) == [1000, 1001, 1002]
    assert by_key["c"] == [2002]
    # weight bias: the 100 heavy rows (20% of key a) must dominate the
    # sample — expected share ~96%, so ≥ 35 of 50 is a generous bound
    heavy = sum(1 for d in by_key["a"] if d >= 400)
    assert heavy >= 35

    # determinism under repartitioning
    again = [
        (r["doc_id"], r["key"])
        for r in S.weighted_sample_per_key(
            df.repartition(7), "doc_id", "key", "w", k=50
        ).collect()
    ]
    assert sorted(again) == sorted(got)


def test_weighted_sample_validates_k(spark):
    df = spark.createDataFrame([(1, "a", 1.0)], "doc_id long, key string, w double")
    with pytest.raises(ValueError):
        S.weighted_sample_per_key(df, "doc_id", "key", "w", 0)


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "bb", "ccc", "dddd"]), max_size=40),
        min_size=1, max_size=20,
    ),
    chunk=st.integers(min_value=2, max_value=12),
    overlap=st.integers(min_value=0, max_value=11),
)
def test_chunk_property_vs_python_reference(docs, chunk, overlap):
    """chunk_documents == the straightforward python chunker for any
    token lists and any valid (chunk, overlap)."""
    from smcchecker_spark.ops import text as T

    if overlap >= chunk:
        overlap = chunk - 1
    step = chunk - overlap
    spark = _SPARK[0]
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["chunk_tokens"])
        for r in T.chunk_documents(df, "doc_id", "text", chunk, overlap).collect()
    )
    want = []
    for i, toks in enumerate(docs):
        n = len(toks)
        if n == 0:
            continue
        n_chunks = max(-(-max(n - overlap, 0) // step), 1)
        for ci in range(n_chunks):
            sl = toks[ci * step: ci * step + chunk]
            want.append((i, ci, " ".join(sl), len(sl)))
    assert got == sorted(want)


def test_weighted_sample_single_scan_single_exchange(spark, tmp_path):
    rows = [(i, "hot" if i < 300 else f"k{i%5}", 1.0 + i % 9)
            for i in range(400)]
    spark.createDataFrame(rows, "doc_id long, key string, w double").write.parquet(
        str(tmp_path / "w")
    )
    df = spark.read.parquet(str(tmp_path / "w"))
    out = S.weighted_sample_per_key(df, "doc_id", "key", "w", k=10)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    import re
    assert len(re.findall(r"Scan parquet", plan)) == 1
    real = [ln for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln and "ReusedExchange" not in ln]
    assert len(real) == 1 and "ReusedExchange" in plan


def test_chunk_arrow_matches_hof(spark, sf_dir):
    """The Arrow chunker (default) and the pure-Column HOF form are the
    same function — full-corpus parity on real documents."""
    from smcchecker_spark.ops import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, T.chunk_documents(
        docs, "doc_id", chunk_tokens=40, overlap_tokens=8).collect()))
    h = sorted(map(tuple, T.chunk_documents(
        docs, "doc_id", chunk_tokens=40, overlap_tokens=8, arrow=False
    ).collect()))
    assert a == h and len(a) > 0


# ---------------------------------------------------------------------------
# ops/sample.py select_within_budget
# ---------------------------------------------------------------------------


def _budget_reference(df, score_col, size_col, budget, id_col):
    w = Window.orderBy(
        F.col(score_col).desc_nulls_last(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum(F.coalesce(F.col(size_col).cast("long"), F.lit(0))).over(w)
    return (
        df.withColumn("cum_size", cum.cast("long"))
        .filter(F.col("cum_size") <= budget)
    )


def test_budget_select_matches_single_window_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: r["cum_size"]
        for r in S.select_within_budget(
            docs, "n_chars", "n_chars", 40_000, "doc_id", num_ranges=8
        ).collect()
    }
    exp = {
        r["doc_id"]: r["cum_size"]
        for r in _budget_reference(docs, "n_chars", "n_chars", 40_000, "doc_id").collect()
    }
    assert got == exp and len(got) > 0


def test_budget_select_invariant_to_range_count(spark):
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        (F.col("id") % 13).alias("score"),
        (F.col("id") % 7 + 1).alias("sz"),
    )
    expect = None
    for p in (1, 4, 16):
        got = sorted(
            (r["k"], r["cum_size"])
            for r in S.select_within_budget(
                df, "score", "sz", 300, "k", num_ranges=p
            ).collect()
        )
        if expect is None:
            expect = got
        assert got == expect


def test_budget_select_null_score_last_null_size_zero(spark):
    rows = [(1, 10.0, 5), (2, None, 5), (3, 20.0, None), (4, 5.0, 5)]
    df = spark.createDataFrame(rows, "k int, score double, sz int")
    # order: k3(20, sz 0) cum 0 -> k1(10) cum 5 -> k4(5) cum 10 -> k2(null) cum 15
    got = {r["k"]: r["cum_size"] for r in S.select_within_budget(
        df, "score", "sz", 10, "k", num_ranges=2
    ).collect()}
    assert got == {3: 0, 1: 5, 4: 10}
    # budget large enough admits the NULL-score row, after everything else
    all_rows = {r["k"]: r["cum_size"] for r in S.select_within_budget(
        df, "score", "sz", 100, "k", num_ranges=2
    ).collect()}
    assert all_rows[2] == 15


def test_budget_select_no_single_partition_exchange(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("score"), F.lit(7).alias("sz")
    )
    out = S.select_within_budget(df, "score", "sz", 700, "k", num_ranges=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    with pytest.raises(ValueError):
        S.select_within_budget(df, "score", "sz", -1, "k")


# ---------------------------------------------------------------------------
# ops/sample.py leakage_safe_split
# ---------------------------------------------------------------------------


def test_leakage_split_clusters_never_straddle(spark):
    """A transitive dup chain (0-1, 1-2) plus a disjoint pair (10-11)
    must each land wholly in one split; unpaired docs keep their plain
    det_split assignment."""
    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: r["split"]
        for r in S.leakage_safe_split(
            df, "doc_id", pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert len(out) == 200
    assert out[0] == out[1] == out[2]
    assert out[10] == out[11]
    plain = {
        r["doc_id"]: r["split"]
        for r in S.det_split(
            df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    clustered = {0, 1, 2, 10, 11}
    for k, v in out.items():
        if k not in clustered:
            assert v == plain[k]
    # cluster members follow the CANONICAL id's plain assignment
    assert out[2] == plain[0] and out[11] == plain[10]


def test_leakage_split_broadcast_parity(spark):
    df = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(3, 7), (7, 42)], "id_a long, id_b long")
    kw = dict(fractions={"a": 0.5, "b": 0.5})
    fast = S.leakage_safe_split(df, "doc_id", pairs, **kw).collect()
    slow = S.leakage_safe_split(
        df, "doc_id", pairs, broadcast_components=False, **kw
    ).collect()
    assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))


def test_rank_normalize_matches_cume_dist(spark):
    rows = [
        (0, "a", 1.0), (1, "a", 2.0), (2, "a", 2.0), (3, "a", 5.0),
        (4, "b", 7.0), (5, "b", None), (6, None, 3.0),
    ]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    got = {r["id"]: r["score_pct"]
           for r in S.rank_normalize(df, ["k"], "v").collect()}
    # group a: CDF(1)=0.25, CDF(2)=0.75 (ties share), CDF(5)=1.0
    assert got[0] == 0.25 and got[1] == 0.75 and got[2] == 0.75 and got[3] == 1.0
    assert got[4] == 1.0           # singleton group
    assert got[5] is None          # NULL score
    assert got[6] is None          # NULL key
    # row count preserved
    assert S.rank_normalize(df, ["k"], "v").count() == len(rows)


# ---------------------------------------------------------------------------
# Training-shard assembly (ops/shards.py)
# ---------------------------------------------------------------------------

from smcchecker_spark.ops import shards as SH


def _shard_reference(rows, target, salt=""):
    """Driver-side greedy reference of the documented semantics:
    (md5 key, id) order -> exclusive cumsum -> floor(start / target)."""
    import hashlib

    keyed = sorted(
        (int(hashlib.md5((salt + str(i)).encode()).hexdigest()[:15], 16), i, sz)
        for i, sz in rows
    )
    out, acc = {}, 0
    for _, i, sz in keyed:
        out[i] = (acc // target, acc)
        acc += sz or 0
    return out


def test_assign_shards_matches_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = [(r["doc_id"], r["n_chars"]) for r in docs.select("doc_id", "n_chars").collect()]
    got = {
        r["doc_id"]: (r["shard_id"], r["off"])
        for r in SH.assign_shards(
            docs, "n_chars", 8192, salt="v1", offset_col="off", num_ranges=8
        ).select("doc_id", "shard_id", "off").collect()
    }
    assert got == _shard_reference(rows, 8192, salt="v1")


def test_assign_shards_range_invariance_and_budget(spark):
    df = spark.range(0, 800).select(
        F.col("id").alias("doc_id"), (F.col("id") % 251 + 20).alias("nb")
    )
    ref = None
    for p in (1, 4, 16):
        a = SH.assign_shards(df, "nb", 2048, num_ranges=p)
        got = sorted((r["doc_id"], r["shard_id"]) for r in a.collect())
        if ref is None:
            ref = got
        else:
            assert got == ref
    # manifest: every shard within one max row of target; rows conserved
    man = SH.shard_manifest(
        SH.assign_shards(df, "nb", 2048, num_ranges=4), "nb", target_bytes=2048
    ).collect()
    max_row = 251 + 20
    assert sum(r["n_docs"] for r in man) == 800
    for r in sorted(man, key=lambda r: r["shard_id"])[:-1]:  # last shard may be short
        assert 2048 - max_row < r["total_size"] <= 2048 + max_row
    with pytest.raises(ValueError):
        SH.assign_shards(df, "nb", 0)


def test_assign_shards_decorrelates_ingest_order(spark):
    # 100 consecutive ids from one "source" must not own a shard: with
    # ~8 shards, a correlated slice would put all 100 in 1-2 shards
    df = spark.range(0, 800).select(
        F.col("id").alias("doc_id"), F.lit(64).alias("nb")
    )
    a = SH.assign_shards(df, "nb", 6400, num_ranges=4)
    touched = (
        a.filter(F.col("doc_id") < 100)
        .select("shard_id").distinct().count()
    )
    assert touched >= 4


def test_assign_shards_caller_order_and_ties(spark):
    # curated order column with ties: the id tiebreak keeps it total
    rows = [(i, 1.0 if i < 6 else 2.0, 100) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, score double, nb int")
    a = SH.assign_shards(
        df, "nb", 300, order_col="score", id_col="doc_id", offset_col="off"
    )
    got = {r["doc_id"]: (r["shard_id"], r["off"]) for r in a.collect()}
    # order = (score, doc_id): ids 0..5 then 6..11; offsets 0,100,...,1100
    for rank, i in enumerate(list(range(6)) + list(range(6, 12))):
        assert got[i] == (rank * 100 // 300, rank * 100), i


def test_write_shards_roundtrip(spark, tmp_path):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50 + 10).alias("nb")
    )
    a = SH.assign_shards(df, "nb", 1024, num_ranges=4)
    path = str(tmp_path / "shards")
    SH.write_shards(a, path, order_col="doc_id")
    back = spark.read.parquet(path)
    assert sorted(
        (r["doc_id"], r["shard_id"]) for r in back.collect()
    ) == sorted((r["doc_id"], r["shard_id"]) for r in a.collect())
    import os
    dirs = [d for d in os.listdir(path) if d.startswith("shard_id=")]
    assert len(dirs) == a.select("shard_id").distinct().count()
