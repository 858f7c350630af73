"""Curation-surface ops: token entropy, corpus-level boilerplate line
removal, and URL/domain features + blocklist filtering.

Hand-computed values; plan tests lock the map-only url pass and the
text-never-shuffles boilerplate shape.
"""

import math
import re

import pytest
from pyspark.sql import functions as F  # noqa: F401 (suite style)

from smcchecker_spark.ops import urls
from smcchecker_spark.ops.text import remove_boilerplate_lines, token_entropy


def _plan(df):
    return (
        df._jdf.queryExecution()
        .explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        .split("== Initial Plan ==")[0]
    )


# ---------------------------------------------------------------------------
# token_entropy
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def entropy_corpus(spark):
    rows = [
        (1, "a b a"),        # skewed: H = ln3 - 2ln2/3
        (2, "a b c"),        # uniform: H = ln3
        (3, "a a a a"),      # constant: H = 0
        (4, ""),             # empty
        (5, None),           # null
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_entropy_values(entropy_corpus):
    got = {r["doc_id"]: r for r in token_entropy(entropy_corpus, "doc_id").collect()}
    assert got[1]["n_tokens"] == 3 and got[1]["n_distinct"] == 2
    assert got[1]["entropy"] == round(math.log(3) - 2 * math.log(2) / 3, 9)
    assert got[1]["ttr"] == round(2 / 3, 9)
    assert got[2]["entropy"] == round(math.log(3), 9) and got[2]["ttr"] == 1.0
    assert got[3]["entropy"] == 0.0 and got[3]["ttr"] == 0.25
    # empty/null docs re-attach with zeros, not dropped
    for d in (4, 5):
        assert got[d]["n_tokens"] == 0 and got[d]["entropy"] == 0.0
        assert got[d]["ttr"] == 0.0


def test_token_entropy_case_folding(spark):
    df = spark.createDataFrame([(1, "A a")], "doc_id long, text string")
    assert token_entropy(df, "doc_id").collect()[0]["n_distinct"] == 1
    assert (
        token_entropy(df, "doc_id", lowercase=False).collect()[0]["n_distinct"]
        == 2
    )


# ---------------------------------------------------------------------------
# remove_boilerplate_lines
# ---------------------------------------------------------------------------

BP = "subscribe to our newsletter"


@pytest.fixture(scope="module")
def lined_corpus(spark):
    rows = [
        (1, BP + "\ncontent one\nab"),        # header + unique + short
        (2, "content two\n" + BP),            # footer position
        (3, BP + "\n " + BP + " "),           # doc of ONLY boilerplate (2x)
        (4, "shared twice\ncontent four"),    # 'shared twice' in 2 docs only
        (5, "shared twice"),
        (6, "ab"),                            # short-only doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_removed_everywhere(lined_corpus):
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(
            lined_corpus, "doc_id", min_docs=3, min_chars=4
        ).collect()
    }
    # BP appears in docs 1,2,3 (>= 3 distinct docs) -> stripped, order kept
    assert out[1]["text"] == "content one\nab"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 1
    assert out[2]["text"] == "content two"
    # whitespace-padded copies share the trimmed fingerprint; a doc of
    # only boilerplate collapses to ''
    assert out[3]["text"] == "" and out[3]["n_removed"] == 2
    # below min_docs -> kept
    assert out[4]["text"] == "shared twice\ncontent four"
    assert out[5]["text"] == "shared twice"
    # short lines are exempt even when universal
    assert out[6]["text"] == "ab" and out[6]["n_removed"] == 0


def test_boilerplate_shuffle_fallback_parity(lined_corpus):
    a = remove_boilerplate_lines(lined_corpus, "doc_id", min_docs=3).collect()
    b = remove_boilerplate_lines(
        lined_corpus, "doc_id", min_docs=3, broadcast_removal=False
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_boilerplate_preserves_columns(lined_corpus):
    df = lined_corpus.withColumn("extra", F.col("doc_id") * 2)
    out = remove_boilerplate_lines(df, "doc_id", min_docs=3)
    assert out.columns == ["doc_id", "text", "extra", "n_lines", "n_removed"]
    assert out.filter("extra != doc_id * 2").count() == 0


def test_boilerplate_plan_shape(lined_corpus):
    plan = _plan(remove_boilerplate_lines(lined_corpus, "doc_id", min_docs=3))
    # corpus text never shuffles: exchanges belong to the (fp, doc) pair
    # aggregation (count_distinct rewrite) + per-doc collect_set; the
    # flagged sliver and the removal table both attach via broadcast
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 4
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# urls
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def url_df(spark):
    rows = [
        (1, "https://user@sub.docs.example.com:8080/a/b/c?x=1&y=2#frag"),
        (2, "http://example.org"),
        (3, "https://localhost/x/"),
        (4, "example.com/no-scheme"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "id long, url string")


def test_url_features_values(url_df):
    got = {r["id"]: r for r in urls.url_features(url_df, "url").collect()}
    r = got[1]
    assert r["scheme"] == "https"
    assert r["host"] == "sub.docs.example.com"  # userinfo + port stripped
    assert r["domain"] == "example.com"
    assert r["path_depth"] == 3 and r["n_params"] == 2
    assert got[2]["domain"] == "example.org"
    assert got[2]["path_depth"] == 0 and got[2]["n_params"] == 0
    # dotless host is its own registered domain; trailing slash no segment
    assert got[3]["domain"] == "localhost" and got[3]["path_depth"] == 1
    # schemeless / null -> empty features, no errors
    for i in (4, 5):
        assert got[i]["scheme"] == "" and got[i]["host"] == ""


def test_url_blocklist_flag_and_filter(spark, url_df):
    bl = spark.createDataFrame([("EXAMPLE.com",), ("nope.net",)], ["domain"])
    flagged = {
        r["id"]: r["is_blocked"]
        for r in urls.flag_blocked_domains(url_df, bl, "url").collect()
    }
    # case-insensitive on both sides; subdomain matches via registered domain
    assert flagged == {1: True, 2: False, 3: False, 4: False, 5: False}
    kept = urls.filter_blocked_domains(url_df, bl, "url")
    assert sorted(r["id"] for r in kept.collect()) == [2, 3, 4, 5]
    assert kept.columns == url_df.columns


def test_url_features_plan_is_map_only(url_df):
    plan = _plan(urls.url_features(url_df, "url"))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_url_blocklist_plan_broadcasts(spark, url_df):
    bl = spark.createDataFrame([("example.com",)], ["domain"])
    plan = _plan(urls.flag_blocked_domains(url_df, bl, "url"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
