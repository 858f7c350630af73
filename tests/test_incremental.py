"""ops/incremental.py — persisted MinHash index + incremental probe.

Parity anchor: the probe's pair set (new x new ∪ new x old) must equal the
full-corpus ``minhash_candidate_pairs`` over old ∪ new restricted to pairs
touching a new id — same signatures, same banding, same skew guards, minus
the old x old work the index already paid for.
"""

import pytest
from pyspark.sql import functions as F

from smcchecker_spark.ops import dedup
from smcchecker_spark.ops import incremental as inc


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    other = "completely different content about spark query engines and joins"
    old = _mk_docs(
        spark,
        [
            (0, base),
            (1, base + " extra words at the end"),
            (2, other),
            (3, "el perro y el gato de la casa que los una"),
            (4, other + " plus a tail"),
        ],
    )
    new = _mk_docs(
        spark,
        [
            (100, base),  # dup of old 0
            (101, other),  # dup of old 2 and near 4
            (102, "totally novel text that matches nothing else at all"),
            (103, base),  # dup of old 0 AND of new 100
        ],
    )
    return old, new


KW = dict(num_hashes=32, bands=16, shingle_k=3)


def _index(tmp_path_factory, old, name):
    path = str(tmp_path_factory.mktemp(name))
    inc.save_minhash_index(old, path, "doc_id", "text", **KW)
    return path


def _pairset(df):
    return {(r["id_a"], r["id_b"], r["est_jaccard"]) for r in df.collect()}


def test_probe_matches_full_pairing(spark, corpus, tmp_path_factory):
    old, new = corpus
    path = _index(tmp_path_factory, old, "idx_parity")
    got = _pairset(
        inc.incremental_candidate_pairs(
            new, path, "doc_id", "text", with_est=True
        )
    )
    new_ids = {100, 101, 102, 103}
    full = dedup.minhash_candidate_pairs(
        old.unionByName(new), "doc_id", "text", with_est=True, **KW
    )
    want = {
        t
        for t in _pairset(full)
        if t[0] in new_ids or t[1] in new_ids
    }
    assert got == want and len(got) >= 3
    # old x old pairs exist in the full run but never in the probe
    assert any(
        t[0] not in new_ids and t[1] not in new_ids for t in _pairset(full)
    )


def test_probe_matches_full_pairing_hot_path(spark, corpus, tmp_path_factory):
    """hot_bucket=1 forces every bucket (old chunks AND new chunks)
    through the chunked path; the pair set must not change."""
    old, new = corpus
    path = _index(tmp_path_factory, old, "idx_hot")
    fast = _pairset(
        inc.incremental_candidate_pairs(new, path, "doc_id", with_est=True)
    )
    hot = _pairset(
        inc.incremental_candidate_pairs(
            new, path, "doc_id", with_est=True, hot_bucket=1
        )
    )
    assert fast == hot


def test_hot_old_bucket_complete(spark, tmp_path_factory):
    """A boilerplate-hot OLD bucket (60 identical docs) probed by 3 new
    copies yields exactly 60*3 new x old + 3 new x new pairs — the
    one-sided chunk guard loses nothing."""
    text = "same boilerplate sentence repeated across the whole corpus"
    old = _mk_docs(spark, [(i, text) for i in range(60)])
    new = _mk_docs(spark, [(1000 + i, text) for i in range(3)])
    path = _index(tmp_path_factory, old, "idx_boiler")
    pairs = inc.incremental_candidate_pairs(
        new, path, "doc_id", hot_bucket=8
    )
    assert pairs.count() == 60 * 3 + 3


def test_append_then_probe_sees_appended_batch(spark, corpus, tmp_path_factory):
    old, new = corpus
    path = _index(tmp_path_factory, old, "idx_append")
    inc.append_to_minhash_index(new, path, "doc_id")
    probe = _mk_docs(
        spark,
        [(200, "totally novel text that matches nothing else at all")],
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in inc.incremental_candidate_pairs(
            probe, path, "doc_id"
        ).collect()
    }
    assert got == {(102, 200)}  # dup lives in the APPENDED batch


def test_incremental_ngram_dedup_exact_verify(spark, corpus, tmp_path_factory):
    old, new = corpus
    path = _index(tmp_path_factory, old, "idx_verify")
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in inc.incremental_ngram_dedup(
            new, old, path, "doc_id", threshold=0.8
        ).collect()
    }
    assert out[(0, 100)] == 1.0 and out[(2, 101)] == 1.0
    assert out[(100, 103)] == 1.0
    assert all(j >= 0.8 for j in out.values())
    assert not any(102 in p for p in out)


def test_probe_plan_no_sortmerge_and_pruned_scan(spark, corpus, tmp_path_factory):
    """The index scan must attach through broadcast joins only (the
    batch side is the small side everywhere) — no sort-merge join, i.e.
    the stored index is never fully shuffled to meet the batch."""
    old, new = corpus
    path = _index(tmp_path_factory, old, "idx_plan")
    pairs = inc.incremental_candidate_pairs(new, path, "doc_id")
    plan = pairs._jdf.queryExecution().explainString(
        pairs._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_meta_roundtrip_and_param_independence(spark, corpus, tmp_path_factory):
    """Probes read banding parameters from the stored meta — a caller
    cannot desynchronize them."""
    old, new = corpus
    path = str(tmp_path_factory.mktemp("idx_meta"))
    inc.save_minhash_index(
        old, path, "doc_id", "text", num_hashes=16, bands=8, shingle_k=2
    )
    assert inc.load_minhash_meta(spark, path) == {
        "num_hashes": 16,
        "bands": 8,
        "shingle_k": 2,
    }
    est = {
        r["est_jaccard"]
        for r in inc.incremental_candidate_pairs(
            new, path, "doc_id", with_est=True
        ).collect()
    }
    assert est and all(0.0 <= e <= 1.0 for e in est)


# ---------------------------------------------------------------------------
# phash (image) incremental index
# ---------------------------------------------------------------------------


def _ph_df(spark, rows):
    return spark.createDataFrame(rows, "image_id long, phash long")


def test_phash_probe_matches_full_pairing(spark, tmp_path_factory):
    import random

    rng = random.Random(11)
    old_rows = [(i, rng.getrandbits(63)) for i in range(80)]
    # batch: near-dup of old 5 (2 bit flips), exact dup of old 7, novel
    new_rows = [
        (1000, old_rows[5][1] ^ 0b101),
        (1001, old_rows[7][1]),
        (1002, rng.getrandbits(63)),
        (1003, old_rows[5][1] ^ 0b101),  # in-batch dup of 1000
    ]
    old, new = _ph_df(spark, old_rows), _ph_df(spark, new_rows)
    path = str(tmp_path_factory.mktemp("phidx"))
    inc.save_phash_index(old, path, chunks=4, max_hamming=3)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in inc.incremental_phash_pairs(new, path).collect()
    }
    full = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.hamming_near_dups(
            old.unionByName(new).selectExpr("image_id as id", "phash as h"),
            "id", "h", max_hamming=3, chunks=4,
        ).collect()
    }
    new_ids = {1000, 1001, 1002, 1003}
    want = {t for t in full if t[0] in new_ids or t[1] in new_ids}
    assert got == want
    assert (5, 1000, 2) in got and (7, 1001, 0) in got and (1000, 1003, 0) in got
    assert not any(t[0] == 1002 or t[1] == 1002 for t in got)


def test_phash_probe_hot_bucket_and_append(spark, tmp_path_factory):
    # 50 identical fingerprints in old (flat images) -> hot bucket
    old = _ph_df(spark, [(i, 0x1234567890) for i in range(50)])
    new = _ph_df(spark, [(900, 0x1234567890 ^ 1)])
    path = str(tmp_path_factory.mktemp("phhot"))
    inc.save_phash_index(old, path)
    pairs = inc.incremental_phash_pairs(new, path, hot_bucket=8)
    assert pairs.count() == 50 and pairs.agg({"hamming": "max"}).first()[0] == 1
    # append the accepted novel batch; next probe sees it
    nov = _ph_df(spark, [(901, 0x0F0F0F0F0F0F)])
    inc.append_to_phash_index(nov, path, ingest_label="b1")
    probe = _ph_df(spark, [(950, 0x0F0F0F0F0F0E)])
    got = {(r["id_a"], r["id_b"]) for r in
           inc.incremental_phash_pairs(probe, path).collect()}
    assert got == {(901, 950)}
    # replay idempotence
    inc.append_to_phash_index(nov, path, ingest_label="b1")
    assert {(r["id_a"], r["id_b"]) for r in
            inc.incremental_phash_pairs(probe, path).collect()} == {(901, 950)}


def test_phash_index_compound_bands_exact_recall(spark, tmp_path_factory):
    """max_hamming=2 indexes band on 2-chunk combinations (32-bit keys
    — single 16-bit chunks saturate ~10^7 images). Probe recall must
    equal brute force, appends must reuse the index's combination
    size, and a looser-than-indexed probe must be refused."""
    import numpy as np

    rng = np.random.default_rng(5)
    base = [int(x) for x in
            rng.integers(-(2**62), 2**62, 30, dtype=np.int64)]
    old_rows = [(i, h) for i, h in enumerate(base)]
    # new batch: 2-bit perturbations of the first 6 + 2 novel values
    new_rows = []
    for i in range(6):
        h = base[i] & (2**64 - 1)
        for b in rng.choice(64, 2, replace=False):
            h ^= 1 << int(b)
        new_rows.append((500 + i, h - 2**64 if h >= 2**63 else h))
    new_rows += [(600, 42), (601, -99)]
    old = _ph_df(spark, old_rows)
    new = _ph_df(spark, new_rows)
    path = str(tmp_path_factory.mktemp("phcombo"))
    inc.save_phash_index(old, path, max_hamming=2)
    meta = spark.read.parquet(f"{path}/meta").first()
    assert meta["band_chunks"] == 2
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in
           inc.incremental_phash_pairs(new, path).collect()}
    allr = old_rows + new_rows
    new_ids = {i for i, _ in new_rows}
    brute = set()
    for i in range(len(allr)):
        for j in range(i + 1, len(allr)):
            if allr[i][0] not in new_ids and allr[j][0] not in new_ids:
                continue  # old x old never re-pairs
            d = bin((allr[i][1] ^ allr[j][1]) & (2**64 - 1)).count("1")
            if d <= 2:
                brute.add((*sorted((allr[i][0], allr[j][0])), d))
    assert got == brute and brute  # planted pairs exist
    # probing looser than the indexed bound must be refused
    import pytest as _pt

    with _pt.raises(ValueError, match="rebuild the index"):
        inc.incremental_phash_pairs(new, path, max_hamming=3)
    # appends reuse the combination size; next probe still exact
    inc.append_to_phash_index(_ph_df(spark, [(700, 42 ^ 3)]), path,
                              ingest_label="b1")
    got2 = {(r["id_a"], r["id_b"]) for r in
            inc.incremental_phash_pairs(
                _ph_df(spark, [(800, 42 ^ 1)]), path
            ).collect()}
    # 700 (appended, hamming(42^3, 42^1)=1) pairs; 600 was probed but
    # never appended, so the index rightly doesn't know it
    assert got2 == {(700, 800)}
