"""Exact substring-span dedup (ops/substrings.py) — hand goldens plus a
brute-force python cross-check (the same epistemics as the dedup family:
the Spark pipeline's hash-prefilter + text-confirm must equal a direct
all-windows computation)."""

import numpy as np
import pytest

from smcchecker_spark.ops import substrings


@pytest.fixture(scope="module")
def spark():
    from smcchecker_spark.session import get_spark

    return get_spark("test-substrings", cores=4)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_spans(rows, window=8, keep_first=True):
    """All-windows reference: duplicated window texts, global
    (doc, pos) keeper, per-doc island merge."""
    occ = {}
    for did, text in rows:
        toks = text.split()
        for p in range(len(toks) - window + 1):
            occ.setdefault(" ".join(toks[p : p + window]), []).append(
                (did, p)
            )
    dropped = {}
    for _, locs in occ.items():
        if len(locs) < 2:
            continue
        locs = sorted(locs)
        for did, p in locs[1:] if keep_first else locs:
            dropped.setdefault(did, set()).add(p)
    out = []
    for did, ps in dropped.items():
        cur_s = cur_e = None
        for p in sorted(ps):
            if cur_s is None:
                cur_s, cur_e = p, p + window
            elif p <= cur_e:
                cur_e = max(cur_e, p + window)
            else:
                out.append((did, cur_s, cur_e))
                cur_s, cur_e = p, p + window
        if cur_s is not None:
            out.append((did, cur_s, cur_e))
    return sorted(out)


def test_basic_cross_doc_span(spark):
    rows = [
        (1, "a b c d e f g h X Y"),
        (2, "z a b c d e f g h w"),
    ]
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substrings.duplicate_substring_spans(
            _df(spark, rows), window=8
        ).collect()
    )
    # "a b c d e f g h" recurs; keeper is (doc 1, pos 0), doc 2 loses
    # tokens [1, 9)
    assert got == [(2, 1, 9)]


def test_overlapping_windows_merge(spark):
    # the 10-token phrase recurs -> three overlapping dup windows in the
    # second doc merge into ONE [0, 10) span
    phrase = "p q r s t u v w x y"
    rows = [(1, phrase + " end1"), (2, phrase + " end2")]
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substrings.duplicate_substring_spans(
            _df(spark, rows), window=8
        ).collect()
    )
    assert got == [(2, 0, 10)]


def test_keep_first_false_drops_all(spark):
    rows = [
        (1, "a b c d e f g h X Y"),
        (2, "z a b c d e f g h w"),
    ]
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substrings.duplicate_substring_spans(
            _df(spark, rows), window=8, keep_first=False
        ).collect()
    )
    assert got == [(1, 0, 8), (2, 1, 9)]


def test_within_doc_repetition(spark):
    # the same 8 tokens twice inside ONE doc: second occurrence dropped
    rows = [(7, "a b c d e f g h SEP a b c d e f g h")]
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substrings.duplicate_substring_spans(
            _df(spark, rows), window=8
        ).collect()
    )
    assert got == [(7, 9, 17)]


def test_remove_duplicate_substrings(spark):
    rows = [
        (1, "a b c d e f g h X Y"),
        (2, "z a b c d e f g h w"),
        (3, "untouched short doc"),
    ]
    out = {
        r["doc_id"]: r["dedup_text"]
        for r in substrings.remove_duplicate_substrings(
            _df(spark, rows), window=8
        ).collect()
    }
    assert out[1] == "a b c d e f g h X Y"  # keeper doc unchanged
    assert out[2] == "z w"
    assert out[3] == "untouched short doc"


def test_matches_bruteforce_on_synthetic_corpus(spark):
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> heavy reuse
    rows = [
        (
            i,
            " ".join(
                vocab[j] for j in rng.integers(0, len(vocab), size=n)
            ),
        )
        for i, n in enumerate(rng.integers(4, 40, size=60).tolist())
    ]
    for window in (5, 8):
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in substrings.duplicate_substring_spans(
                _df(spark, rows), window=window
            ).collect()
        )
        assert got == _brute_spans(rows, window=window), window


def test_removal_then_respans_is_clean_or_smaller(spark):
    # after removal, re-running finds at most seam-created dups (never
    # the original spans again) — the Lee et al. fixed-point caveat
    rows = [
        (1, "a b c d e f g h X Y"),
        (2, "z a b c d e f g h w"),
    ]
    cleaned = substrings.remove_duplicate_substrings(
        _df(spark, rows), window=8
    ).select("doc_id", substrings.F.col("dedup_text").alias("text"))
    again = substrings.duplicate_substring_spans(cleaned, window=8)
    assert again.count() == 0
