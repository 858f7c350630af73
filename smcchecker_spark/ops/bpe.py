"""Byte-pair-encoding tokenizer: train on a bounded sample, apply
distributed.

The real thing, not the regex approximation (`text.bpe_ish_token_count`
stays for cheap budgeting): classic BPE (Sennrich et al. 2016) — start
from characters, repeatedly merge the most frequent adjacent symbol
pair — trained DRIVER-SIDE on a deterministic bounded sample (the same
train-once pattern as `similarity.train_centroids` /
`pq.train_pq_codebooks`: at 10^12 rows you learn merges from a sample
measured in megabytes and persist them like any model artifact), then
applied corpus-wide as ONE map-only Arrow pass with the merge table in
the UDF closure.

Scale shape: training never touches the cluster beyond the sample
collect; application is embarrassingly parallel (no shuffle), and the
per-batch word→encoding memo means each DISTINCT word is encoded once
per Arrow batch — natural text repeats words heavily, so the greedy
merge loop runs on the vocabulary, not the token stream.

Determinism: merge selection ties break on the pair itself (count
DESC, pair ASC), sample order is id-sorted, and application is a pure
function of (merges, text) — same artifacts and encodings on every
run/host/partitioning.

Not SQL-expressible (training and application are inherently
iterative) → library + pytest surface, no oracle query; the token
COUNTS it produces feed the same budget/packing/mix ops as the regex
counter.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# end-of-word sentinel: lets merges distinguish "er</w>" (suffix) from
# "er" (infix) — the classic formulation
EOW = "</w>"


def _pretokenize(text: str) -> list[str]:
    """Whitespace words — the same boundary rule as ``text.tokens`` so
    BPE counts and whitespace counts are comparable."""
    return text.split() if text else []


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    sample_docs: int = 2048,
    id_col: str = "doc_id",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from an id-ordered bounded sample.
    Returns the ordered merge list (rank = position) — persist it like
    a model artifact and hand it to :func:`apply_bpe`."""
    rows = (
        df.orderBy(id_col)
        .limit(sample_docs)
        .select(F.coalesce(F.col(text_col), F.lit("")).alias("t"))
        .collect()
    )
    word_freq: Counter = Counter()
    for r in rows:
        word_freq.update(_pretokenize(r["t"]))
    vocab = {_word_symbols(w): c for w, c in word_freq.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # deterministic winner: count DESC, then pair ASC
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the best-ranked
    adjacent pair. Unseen words degrade gracefully to characters."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize the corpus with a trained merge list: one map-only
    Arrow pass, merge table in the closure (it is a few KB), per-batch
    word→encoding memo so each distinct word's greedy loop runs once
    per batch."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @pandas_udf("array<string>")
    def bpe(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            memo: dict[str, list[str]] = {}
            out = []
            for t in s.values:
                toks: list[str] = []
                for w in _pretokenize(t or ""):
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        memo[w] = enc
                    toks.extend(enc)
                out.append(toks)
            yield pd.Series(out)

    return df.withColumn(out_col, bpe(F.col(text_col)))


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Token-budget column from a trained tokenizer — drop-in for the
    regex approximation wherever real counts matter (packing, budget
    selection, mixes)."""
    tok = apply_bpe(df, merges, text_col, out_col="_bpe")
    return tok.withColumn(out_col, F.size(F.col("_bpe"))).drop("_bpe")


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    """Persist the merge list as a text artifact (one merge per line,
    space-separated — the conventional merges.txt layout)."""
    with open(path, "w", encoding="utf-8") as fh:
        for a, b in merges:
            fh.write(f"{a} {b}\n")


def load_merges(path: str) -> list[tuple[str, str]]:
    out = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            a, _, b = line.partition(" ")
            out.append((a, b))
    return out
