"""dataset_card: exact corpus datasheet from ONE aggregation.

Value parity is hand-computed on a 5-doc corpus covering the edge set
(exact dup after whitespace/case normalization, whitespace-only doc,
NULL text, NULL lang); the plan test locks the one-scan / one-exchange
shape the docstring claims.
"""

import pytest
from pyspark.sql import Row

from smcchecker_spark.ops.report import dataset_card


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="Hello world", lang="en", source="web"),
            # same normalized fingerprint as doc 1 (case + ws collapse)
            Row(doc_id=2, text="hello   WORLD ", lang="en", source="web"),
            Row(doc_id=3, text="   ", lang="fr", source="books"),
            Row(doc_id=4, text=None, lang=None, source="books"),
            Row(doc_id=5, text="unique doc three tokens", lang="de", source="cc"),
        ]
    )


def test_card_values_exact(docs):
    got = {r["metric"]: r["value"] for r in dataset_card(docs).collect()}
    assert got == {
        "n_docs": 5.0,
        "n_sources": 3.0,
        "n_langs": 3.0,  # NULL lang not counted
        "n_empty": 2.0,  # whitespace-only + NULL
        # 3 non-empty docs, 2 distinct fingerprints -> 1/3
        "exact_dup_rate": 0.333333,
        "total_tokens": 8.0,  # 2 + 2 + 0 + 0 + 4
        "mean_tokens": 1.6,  # over ALL docs, empties count 0
        "mean_chars": 10.2,  # (11 + 14 + 3 + 0 + 23) / 5
    }


def test_card_single_aggregation_plan(docs):
    plan = (
        dataset_card(docs)
        ._jdf.queryExecution()
        .explainString(
            docs._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        .split("== Initial Plan ==")[0]
    )
    # ONE scan; Catalyst rewrites the 3 count_distincts through Expand,
    # which costs exactly 2 exchanges (gid-grouped partial -> final
    # SinglePartition) regardless of input size — no second scan, no
    # join, no Python UDF (formatted plans repeat node names in the
    # detail section, so count numbered node lines)
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) (?:LocalTableScan|Scan)", plan)) == 1
    assert "Join" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_card_empty_corpus(spark):
    df = spark.createDataFrame([], "text string, lang string, source string")
    got = {r["metric"]: r["value"] for r in dataset_card(df).collect()}
    assert got["n_docs"] == 0.0
    assert got["exact_dup_rate"] == 0.0  # guarded by GREATEST(n_ne, 1)
    assert got["total_tokens"] == 0.0 or got["total_tokens"] is None
