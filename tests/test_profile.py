"""stats.suggest_suite — the profile -> constraints loop. Properties
locked: (1) the suggested suite passes on the snapshot it was profiled
from; (2) each suggestion family is actually derived (NotNull / Unique /
Range / InLookup appear for the columns that warrant them and NOT for
ones that don't); (3) corrupting the table trips exactly the matching
suggested checks."""

import pytest
from pyspark.sql import functions as F

from smcchecker_spark import stats
from smcchecker_spark.compile import compile_suite


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def suggestion(docs):
    return stats.suggest_suite(docs, name="docs_auto", table="documents")


def test_suggested_families(suggestion):
    suite, ctx = suggestion
    names = {c.name for c in suite.constraints}
    # doc_id is unique and never null; lang/source are bounded sets;
    # n_chars is numeric
    assert "unique_doc_id" in names
    assert "notnull_doc_id" in names
    assert "range_n_chars" in names
    assert "inlookup_lang_lu_lang" in names
    assert "inlookup_source_lu_source" in names
    # text is high-NDV: must NOT become a lookup; lang is low-NDV: must
    # NOT be suggested unique
    assert "inlookup_text_lu_text" not in names
    assert "unique_lang" not in names
    assert "lu_lang" in ctx.lookups and "lu_source" in ctx.lookups


def test_snapshot_passes_its_own_suite(docs, suggestion):
    suite, ctx = suggestion
    out = compile_suite(docs, suite, ctx, row_id_col="doc_id",
                        part_id_col=None)
    assert out.count() == 0


def test_corruption_trips_matching_checks(docs, suggestion):
    suite, ctx = suggestion
    vid = F.col("doc_id")
    dirty = docs.select(
        "doc_id",
        F.when(vid % 11 == 3, F.lit(None)).otherwise(F.col("text")).alias("text"),
        F.when(vid % 13 == 4, F.lit("xx")).otherwise(F.col("lang")).alias("lang"),
        "source",
        F.when(vid % 19 == 6, F.col("n_chars") * 1000).otherwise(
            F.col("n_chars")
        ).alias("n_chars"),
    )
    dirty = dirty.unionByName(dirty.filter(vid % 17 == 5))
    out = compile_suite(dirty, suite, ctx, row_id_col="doc_id",
                        part_id_col=None)
    got = {r["check_name"] for r in out.select("check_name").distinct().collect()}
    assert {"notnull_text", "inlookup_lang_lu_lang", "range_n_chars",
            "unique_doc_id"} <= got


def test_range_slack_widens_bounds(docs):
    suite, _ = stats.suggest_suite(
        docs, name="d", table="documents", columns=["n_chars"],
        range_slack=0.5,
    )
    rng = next(c for c in suite.constraints if c.name == "range_n_chars")
    tight, _ = stats.suggest_suite(
        docs, name="d", table="documents", columns=["n_chars"],
    )
    trng = next(c for c in tight.constraints if c.name == "range_n_chars")
    assert rng.lo < trng.lo and rng.hi > trng.hi


def test_suggest_expectations_pass_on_profiled_snapshot(spark, sf_dir):
    """The suggested table-level expectations must hold on the snapshot
    they were profiled from (the suggest→check loop's base property)."""
    from smcchecker_spark.stats import check_expectations, suggest_expectations

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_quantity", "l_returnflag", "l_tax"
    )
    exps = suggest_expectations(li)
    out = check_expectations(li, exps)
    bad = [r["check"] for r in out.collect() if not r["ok"]]
    assert bad == []
    # shape: 1 row_count + (null_rate + ndv) per column + min/max for
    # the two numeric columns
    assert len(exps) == 1 + 2 * 3 + 2 * 2
