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


def _brute_long_spans(
    rows,
    seed_window=4,
    min_len=50,
    max_gap=8,
    min_seeds=8,
    max_occ=64,
):
    """Direct reference for long_duplicate_spans: seed windows by TEXT,
    all pairs per window (2..max_occ occurrences), diagonal chaining
    with start-gap <= seed_window+max_gap, length/seed-count filters,
    b-side projection, per-doc touching-interval merge."""
    occ = {}
    for did, text in rows:
        toks = text.split()
        for p in range(len(toks) - seed_window + 1):
            occ.setdefault(
                " ".join(toks[p : p + seed_window]), []
            ).append((did, p))
    groups = {}
    for _, locs in occ.items():
        if not (2 <= len(locs) <= max_occ):
            continue
        locs = sorted(locs)
        for i in range(len(locs)):
            for j in range(i + 1, len(locs)):
                (ia, pa), (ib, pb) = locs[i], locs[j]
                groups.setdefault((ia, ib, pa - pb), []).append(pa)
    raw = {}
    for (ia, ib, diag), ps in groups.items():
        ps = sorted(ps)
        chain = [ps[0]]
        for p in ps[1:] + [None]:
            if p is not None and p - chain[-1] <= seed_window + max_gap:
                chain.append(p)
                continue
            a_s, a_e = chain[0], chain[-1] + seed_window
            if a_e - a_s >= min_len and len(chain) >= min_seeds:
                raw.setdefault(ib, set()).add((a_s - diag, a_e - diag))
            chain = [p] if p is not None else []
    out = []
    for did, spans in raw.items():
        cur_s = cur_e = None
        for s, e in sorted(spans):
            if cur_s is None:
                cur_s, cur_e = s, e
            elif s <= cur_e:
                cur_e = max(cur_e, e)
            else:
                out.append((did, cur_s, cur_e))
                cur_s, cur_e = s, e
        if cur_s is not None:
            out.append((did, cur_s, cur_e))
    return sorted(out)


def _mutate_every(text, period, tag):
    toks = text.split()
    return " ".join(
        f"{tag}{i}" if i % period == 0 else t for i, t in enumerate(toks)
    )


def test_long_spans_catch_what_fixed_w_provably_misses(spark):
    """The round-4 verdict fixture: a 400-token passage shared between
    two docs with one token changed every 7 tokens. Every 8-token
    window straddles an edit -> the fixed-W=8 pass finds NOTHING for
    the pair (proved here), while seed-and-extend recovers essentially
    the whole passage as one span on the later doc."""
    passage = " ".join(f"p{i}" for i in range(400))
    rows = [
        (1, "intro one two " + passage + " outro alpha"),
        (2, "lead " + _mutate_every(passage, 7, "mut") + " tail beta"),
    ]
    fixed = substrings.duplicate_substring_spans(
        _df(spark, rows), window=8
    ).collect()
    assert fixed == []  # provably under-merges: zero exact 8-windows

    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substrings.long_duplicate_spans(
            _df(spark, rows), seed_window=4, min_len=50
        ).collect()
    )
    assert len(got) == 1
    did, s, e = got[0]
    assert did == 2  # keeper = globally earlier (doc 1) occurrence
    # doc 2's passage occupies token positions [1, 401); the recovered
    # span must cover the bulk of it (edges around mutations may shave
    # a few tokens) and must not leak into lead/tail filler
    assert s >= 1 and e <= 401
    assert e - s >= 380
    assert got == _brute_long_spans(rows, seed_window=4, min_len=50)


def test_long_spans_reject_scattered_coincidence(spark):
    """Docs sharing many 4-grams at inconsistent alignments (no common
    diagonal) produce no long span — the chaining filter is the
    precision guard."""
    rng = np.random.default_rng(23)
    vocab = [f"v{i}" for i in range(10)]  # heavy 4-gram reuse
    rows = [
        (
            i,
            " ".join(
                vocab[j] for j in rng.integers(0, len(vocab), size=120)
            ),
        )
        for i in range(6)
    ]
    got = substrings.long_duplicate_spans(
        _df(spark, rows), seed_window=4, min_len=50
    ).collect()
    assert (
        sorted(
            (r["doc_id"], r["span_start"], r["span_end"]) for r in got
        )
        == _brute_long_spans(rows, seed_window=4, min_len=50)
    )


def test_long_spans_within_doc_and_multi_copy(spark):
    """One doc repeating a 60-token passage (later copy dropped) plus a
    third doc carrying a mutated copy — brute cross-check with relaxed
    thresholds exercises chain splits and the interval merge."""
    passage = " ".join(f"q{i}" for i in range(60))
    rows = [
        (1, passage + " mid " + passage),
        (2, "pre " + _mutate_every(passage, 9, "zz") + " post"),
        (3, "unrelated " + " ".join(f"r{i}" for i in range(40))),
    ]
    kw = dict(seed_window=4, min_len=30, max_gap=6, min_seeds=5)
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substrings.long_duplicate_spans(
            _df(spark, rows), **kw
        ).collect()
    )
    assert got == _brute_long_spans(rows, **kw)
    docs_hit = {d for d, _, _ in got}
    assert docs_hit == {1, 2}  # doc 1's second copy + doc 2's mutation


def test_long_spans_bruteforce_synthetic_corpus(spark):
    """Randomized corpus with planted shared passages — exact set
    equality against the direct reference at two parameterizations."""
    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(200)]
    shared = " ".join(
        vocab[j] for j in rng.integers(0, len(vocab), size=35)
    )
    rows = []
    for i in range(40):
        body = " ".join(
            vocab[j]
            for j in rng.integers(
                0, len(vocab), size=int(rng.integers(20, 70))
            )
        )
        if i % 7 == 0:  # plant the shared passage, sometimes mutated
            ins = shared if i % 14 == 0 else _mutate_every(shared, 11, "m")
            body = body + " " + ins
        rows.append((i, body))
    for kw in (
        dict(seed_window=4, min_len=25, max_gap=8, min_seeds=5),
        dict(seed_window=3, min_len=20, max_gap=5, min_seeds=4,
             max_occ=32),
    ):
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in substrings.long_duplicate_spans(
                _df(spark, rows), **kw
            ).collect()
        )
        assert got == _brute_long_spans(rows, **kw), kw
        assert got  # planted passages guarantee non-trivial output


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


def test_remove_long_duplicate_substrings(spark):
    """Apply-side of the seed-and-extend pass: the later/mutated copy
    of a long shared passage is excised (keeper doc untouched,
    unrelated docs untouched), and the removal matches the span set
    exactly (brute-checked token filter)."""
    passage = " ".join(f"p{i}" for i in range(120))
    rows = [
        (1, "intro " + passage + " outro"),
        (2, "lead " + _mutate_every(passage, 7, "mm") + " tail"),
        (3, "unrelated " + " ".join(f"u{i}" for i in range(30))),
    ]
    kw = dict(seed_window=4, min_len=40, max_gap=8, min_seeds=8)
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in substrings.long_duplicate_spans(
            _df(spark, rows), **kw
        ).collect()
    }
    out = {
        r["doc_id"]: r["dedup_text"]
        for r in substrings.remove_long_duplicate_substrings(
            _df(spark, rows), **kw
        ).collect()
    }
    assert out[1] == rows[0][1]  # keeper untouched
    assert out[3] == rows[2][1]  # unrelated untouched
    toks2 = rows[1][1].split()
    s, e = spans[2]
    expect = " ".join(
        t for i, t in enumerate(toks2) if not (s <= i < e)
    )
    assert out[2] == expect
    assert len(out[2].split()) < len(toks2) - 80  # bulk actually removed
