"""vocabulary: corpus term/doc-frequency + smoothed IDF table.

Hand-computed values on a corpus with within-doc repeats, case folding,
and empty/NULL docs; plan test locks the no-Python, bounded-exchange
aggregation shape.
"""

import re

from pyspark.sql import functions as F  # noqa: F401 (parity with suite style)
import pytest

from smcchecker_spark.ops import text
from smcchecker_spark.ops.text import vocabulary

LN2_IDF = 1.693147181  # round(ln((5+1)/(2+1)) + 1, 9)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(1, "a b a c"), (2, "A b"), (3, "c"), (4, ""), (5, None)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_tf_df_idf(corpus):
    got = {
        r["token"]: (r["tf"], r["df"], r["idf"])
        for r in vocabulary(corpus, id_col="doc_id").collect()
    }
    # 'a' repeats inside doc 1: tf counts occurrences, df counts docs
    assert got == {
        "a": (3, 2, LN2_IDF),
        "b": (2, 2, LN2_IDF),
        "c": (2, 2, LN2_IDF),
    }


def test_vocab_case_folding_off(corpus):
    got = {r["token"]: r["tf"] for r in vocabulary(corpus, lowercase=False).collect()}
    assert got["A"] == 1 and got["a"] == 2


def test_vocab_min_df(corpus):
    assert vocabulary(corpus, min_df=3).count() == 0
    assert vocabulary(corpus, min_df=2).count() == 3


def test_vocab_top_n_deterministic_ties(corpus):
    rows = vocabulary(corpus, id_col="doc_id", top_n=2).collect()
    # tf desc then token asc: a(3) first, then the b/c tie at tf=2 -> b
    assert [r["token"] for r in rows] == ["a", "b"]


def test_vocab_plan_shape(corpus):
    plan = (
        vocabulary(corpus, id_col="doc_id", top_n=100)
        ._jdf.queryExecution()
        .explainString(
            corpus._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        .split("== Initial Plan ==")[0]
    )
    # exploded tokens combine map-side: 2 exchanges for the
    # count_distinct rewrite ((token, doc) partial -> token final) plus
    # 1 for the n_docs scalar; the scalar attaches via broadcast, never
    # a shuffle join; top_n plans as TakeOrderedAndProject (no global
    # sort exchange); zero Python stages
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# tfidf_keywords — per-doc top-k characteristic terms
# ---------------------------------------------------------------------------


def test_tfidf_keywords_ranks_distinctive_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple common common"),
            (2, "banana banana common common"),
            (3, "apple banana common"),
        ],
        "doc_id long, text string",
    )
    out = text.tfidf_keywords(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.token, r.tf_doc))
    # every doc gets <= k rows, rank is 1-based contiguous
    assert all(sorted(x[0] for x in v) == list(range(1, len(v) + 1))
               for v in by_doc.values())
    # 'common' appears in all docs -> lowest idf -> never ranks above the
    # distinctive term
    assert by_doc[1][0][1] == "apple"
    assert by_doc[2][0][1] == "banana"
    # tf_doc counted per doc
    assert dict((t, c) for _, t, c in by_doc[1])["apple"] == 3


def test_tfidf_keywords_min_df_prunes_hapax(spark):
    docs = spark.createDataFrame(
        [(1, "unique1 shared"), (2, "unique2 shared")],
        "doc_id long, text string",
    )
    out = text.tfidf_keywords(docs, k=5, min_df=2).collect()
    assert {r.token for r in out} == {"shared"}
