"""Synthesize a larger scale factor from an existing testdata dir.

Usage: python tools/make_scaled_sf.py SRC_DIR DST_DIR FACTOR

Replicates every fact table FACTOR times with deterministic
perturbation so the result behaves like a true scale-up rather than a
pile of clones:

- id/key columns are shifted by copy * 2^40 (joins stay consistent
  within a copy; uniqueness is preserved globally);
- dimension tables (region, nation) and dim foreign keys are left
  alone — real corpora grow facts, not dims;
- documents.text is word-shuffled per (doc_id, copy) and n_chars
  recomputed — otherwise every doc would acquire FACTOR-1 exact/near
  duplicates and dedup pair counts would blow up quadratically,
  invalidating the throughput curve the scaled point exists to show;
- embeddings.embedding is np.roll'ed by the copy index (same norms and
  coordinate distribution, genuinely different directions) for the
  same reason.

Distribution-shaped columns (events.value, prices, dates) are copied
untouched so drift/stats queries see the same distributions at 10x the
rows. Deterministic end to end: same inputs -> byte-identical outputs.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

STRIDE = 1 << 40

SHIFT_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
}
DIM_TABLES = ["region", "nation"]


def _shuffle_words(text: str, seed: int) -> str:
    """Shuffle AND substitute: shuffling alone defeats shingle-based
    dedup (MinHash) but NOT order-invariant fingerprints — SimHash over
    the word multiset is identical for every shuffled copy, which made
    the first sf1 cut measure a corpus with 10x planted signature dups
    instead of a 10x corpus. Tagging ~30% of tokens per copy changes
    the multiset too."""
    words = text.split()
    rng = np.random.default_rng(seed)
    rng.shuffle(words)
    marks = rng.random(len(words)) < 0.3
    tag = str(seed % 97)
    return " ".join(
        w + tag if m else w for w, m in zip(words, marks)
    )


def scale_table(name: str, src: str, dst: str, factor: int) -> int:
    tbl = pq.read_table(os.path.join(src, f"{name}.parquet"))
    if name in DIM_TABLES:
        pq.write_table(tbl, os.path.join(dst, f"{name}.parquet"))
        return tbl.num_rows
    copies = []
    df0 = tbl.to_pandas()
    for i in range(factor):
        df = df0.copy()
        for col in SHIFT_COLS.get(name, []):
            df[col] = df[col] + i * STRIDE
        if i > 0 and name == "documents":
            df["text"] = [
                _shuffle_words(t, (d % STRIDE) * 977 + i)
                for d, t in zip(df["doc_id"], df["text"])
            ]
            df["n_chars"] = df["text"].str.len().astype("int64")
        if i > 0 and name == "embeddings":
            df["embedding"] = [
                np.roll(np.asarray(v, dtype=np.float32), i).tolist()
                for v in df["embedding"]
            ]
        copies.append(pa.Table.from_pandas(df, schema=tbl.schema,
                                           preserve_index=False))
    out = pa.concat_tables(copies)
    pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
    return out.num_rows


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for name in list(SHIFT_COLS) + DIM_TABLES:
        n = scale_table(name, src, dst, factor)
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
