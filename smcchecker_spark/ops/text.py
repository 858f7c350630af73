"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting. Everything except language-ID is pure Column expressions
(JVM-side, oracle-SQL-expressible); language-ID is an n-gram/stopword
heuristic over a broadcast-free literal table, still expression-only.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# tiny per-language stopword marker sets for the heuristic language ID
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "with"],
    "es": ["el", "la", "de", "que", "los", "una"],
    "fr": ["le", "la", "les", "des", "est", "une"],
    "de": ["der", "die", "und", "ist", "das", "ein"],
}

_STOPWORDS = sorted({w for ws in _LANG_MARKERS.values() for w in ws})


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty/null → empty array."""
    t = F.trim(F.coalesce(col, F.lit("")))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: split on word boundaries AND digit/punct
    runs (a regex approximation of BPE segmentation for budgeting)."""
    t = F.coalesce(col, F.lit(""))
    pieces = F.regexp_extract_all(
        t, F.lit(r"[A-Za-z]{1,4}|\d|[^\sA-Za-z\d]"), 0
    )
    return F.size(pieces)


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct character n-grams (shingles) of the normalized text."""
    norm = F.lower(F.regexp_replace(F.coalesce(col, F.lit("")), r"\s+", " "))
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.substring(norm, i, n))
    )


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (the MinHash unit for document dedup)."""
    tk = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(tk) - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(tk, i + 1, k), " "))
    )


def punct_ratio(col: Column) -> Column:
    t = F.coalesce(col, F.lit(""))
    n_punct = F.length(F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", ""))
    return n_punct / F.greatest(F.length(t), F.lit(1))


def stopword_ratio(col: Column) -> Column:
    tk = tokens(F.lower(col))
    hits = F.size(F.array_intersect(F.array_distinct(tk), F.array(*[F.lit(w) for w in _STOPWORDS])))
    # ratio of distinct stopwords present to distinct tokens (cheap proxy)
    return hits / F.greatest(F.size(F.array_distinct(tk)), F.lit(1))


def mean_word_length(col: Column) -> Column:
    tk = tokens(col)
    total = F.aggregate(tk, F.lit(0), lambda acc, w: acc + F.length(w))
    return total / F.greatest(F.size(tk), F.lit(1))


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: length sweet-spot, moderate
    punctuation, plausible mean word length. Deterministic arithmetic so
    an ANSI-SQL oracle can reproduce it exactly."""
    n = F.length(F.coalesce(col, F.lit("")))
    len_score = F.least(n / F.lit(200.0), F.lit(1.0)) * F.when(
        n > 10000, F.lit(0.5)
    ).otherwise(F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 4)
    mwl = mean_word_length(col)
    wl_score = F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(len_score * punct_pen * wl_score, 6)


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits;
    'und' (undetermined) when nothing matches."""
    tk = F.array_distinct(tokens(F.lower(col)))
    scored = [
        F.struct(
            F.size(
                F.array_intersect(tk, F.array(*[F.lit(w) for w in ws]))
            ).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(_LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scored))
    return F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(
        F.lit("und")
    )


def raw_word_shingles(col: Column, k: int = 2) -> Column:
    """k-word shingles WITHOUT dedup (for repetition metrics, which need
    multiplicity; :func:`word_shingles` dedups for MinHash)."""
    tk = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(tk) - k, F.lit(0)))
    return F.when(F.size(tk) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(tk, i + 1, k), " "))
    )


def dup_word_fraction(col: Column) -> Column:
    """Fraction of token occurrences that repeat an earlier token:
    (n - n_distinct) / n. 0 for empty docs. One of the Gopher-style
    repetition signals ("Scaling Language Models", Rae et al. 2021,
    §A1.1) used to drop boilerplate/spam before training."""
    tk = tokens(col)
    n = F.size(tk)
    return F.round(
        (n - F.size(F.array_distinct(tk))) / F.greatest(n, F.lit(1)), 6
    )


def dup_shingle_fraction(col: Column, k: int = 2) -> Column:
    """Fraction of word k-gram occurrences that are repeats — catches
    looped phrases that word-level dedup misses."""
    sh = raw_word_shingles(col, k)
    n = F.size(sh)
    return F.round(
        (n - F.size(F.array_distinct(sh))) / F.greatest(n, F.lit(1)), 6
    )


def top_word_fraction(col: Column) -> Column:
    """Share of the single most frequent token: max multiplicity / n.

    Computed as the longest run in the SORTED token array via one
    ``aggregate`` fold — O(n log n) per row, no explode/groupBy (an
    exploded formulation shuffles one row per token: |corpus|×|doc len|
    rows through an exchange, versus zero exchanges here). The fold is
    an interpreted HOF, but it runs on ≤ doc-length arrays inside the
    same projection as the other features — still one scan.
    """
    tk = F.array_sort(tokens(col))
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, w: Column) -> Column:
        run = F.when(w.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            w.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    best = F.aggregate(tk, zero, step, lambda acc: acc["best"])
    return F.round(best / F.greatest(F.size(tk), F.lit(1)), 6)


_REP_UDF_CACHE: dict[int, object] = {}


def _repetition_counts_udf(k: int = 2):
    """Arrow-batched raw repetition COUNTS per doc: (n tokens, distinct
    tokens, k-gram count, distinct k-grams, top-token multiplicity).

    Why a UDF: the Column-expression forms above are exact but run as
    interpreted higher-order functions — the k-gram path is O(n) slice
    lambdas PER ROW outside codegen and measured ~160 µs/doc at 64
    tokens (2M-doc soak); this batched dict-counting pass is O(n) per
    doc and ~20× faster. It returns INTEGERS ONLY — the fractions (and
    their rounding) are derived by native ``F.round`` expressions in
    :func:`repetition_features`, so values match the Column forms and
    the SQL oracle bit-for-bit by construction."""
    if k not in _REP_UDF_CACHE:
        from collections import Counter

        @pandas_udf("struct<n:int,nd:int,ng:int,ngd:int,top:int>")
        def rep_counts(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
            # struct-typed iterator UDFs yield DataFrames (one column per
            # struct field), not Series
            for s in batches:
                out = []
                for txt in s.values:
                    toks = str(txt).split() if txt is not None else []
                    n = len(toks)
                    if n == 0:
                        out.append((0, 0, 0, 0, 0))
                        continue
                    wc = Counter(toks)
                    ngrams = (
                        [" ".join(toks[i : i + k]) for i in range(n - k + 1)]
                        if n > k - 1
                        else [" ".join(toks)]
                    )
                    out.append(
                        (n, len(wc), len(ngrams), len(set(ngrams)), max(wc.values()))
                    )
                yield pd.DataFrame(
                    out, columns=["n", "nd", "ng", "ngd", "top"]
                )

        _REP_UDF_CACHE[k] = rep_counts
    return _REP_UDF_CACHE[k]


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition metrics, fused into one
    pass (single scan, zero exchanges, one Arrow stage): duplicate-word
    fraction, duplicate-bigram fraction, top-word share. Pipelines
    threshold these to drop template/spam documents before dedup and
    training. Counting runs in one Arrow-batched UDF
    (:func:`_repetition_counts_udf`); fractions are native ``F.round``
    expressions over the returned integers, identical to the scalar
    Column forms (``dup_word_fraction`` etc.) and the SQL oracle."""
    c = _repetition_counts_udf(2)(F.col(text_col))
    tmp = df.withColumn("_rc", c)
    r = F.col("_rc")
    one = F.lit(1)
    return tmp.withColumns(
        {
            "n_tokens": r["n"],
            "dup_word_frac": F.round(
                (r["n"] - r["nd"]) / F.greatest(r["n"], one), 6
            ),
            "dup_bigram_frac": F.round(
                (r["ng"] - r["ngd"]) / F.greatest(r["ng"], one), 6
            ),
            "top_word_frac": F.round(r["top"] / F.greatest(r["n"], one), 6),
        }
    ).drop("_rc")


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of case/whitespace-
    normalized text (md5 so a DuckDB oracle matches bit-for-bit)."""
    norm = F.lower(F.trim(F.regexp_replace(F.coalesce(col, F.lit("")), r"\s+", " ")))
    return F.md5(norm)


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All per-document features in one fused projection (single scan)."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "n_tokens_bpe": bpe_ish_token_count(c),
            "quality": quality_score(c),
            "lang_pred": lang_id(c),
            "fingerprint": fingerprint(c),
            "punct_ratio": F.round(punct_ratio(c), 6),
            "stopword_ratio": F.round(stopword_ratio(c), 6),
        }
    )


def _chunks_udf(chunk: int, overlap: int):
    key = ("chunks", chunk, overlap)
    if key not in _SHARED_UDF_CACHE:
        step = chunk - overlap

        @pandas_udf("array<struct<chunk_id:int,chunk_text:string,chunk_tokens:int>>")
        def chunks(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for s in batches:
                out = []
                for txt in s.values:
                    toks = str(txt).split() if txt is not None else []
                    if not toks:
                        out.append([])
                        continue
                    n = len(toks)
                    n_chunks = max(-(-max(n - overlap, 0) // step), 1)
                    out.append([
                        (ci, " ".join(sl), len(sl))
                        for ci in range(n_chunks)
                        for sl in (toks[ci * step: ci * step + chunk],)
                    ])
                yield pd.Series(out, dtype=object)

        _SHARED_UDF_CACHE[key] = chunks
    return _SHARED_UDF_CACHE[key]


_SHARED_UDF_CACHE: dict = {}


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap_tokens: int = 64,
    arrow: bool = True,
) -> DataFrame:
    """Split documents into overlapping fixed-size token windows — the
    context-window chunking step before tokenization/packing in a
    training pipeline (and before embedding in a retrieval one).

    Output: one row per chunk — (id, chunk_id, chunk_text, chunk_tokens)
    with ``chunk_id`` 0-based in document order. Chunks start every
    ``chunk_tokens - overlap_tokens`` tokens; the last chunk is shorter
    when the document doesn't divide evenly, and a start past
    ``n - overlap`` is never emitted (a chunk that adds no new tokens is
    pure duplication). Documents with zero tokens yield NO rows — empty
    payloads belong to the validation suite, not the chunker.

    Execution: pure Column higher-order functions (sequence → transform
    → posexplode for ``arrow=False``) — a map-only 1→k explode, no
    shuffle. The default path is one Arrow-batched UDF emitting the
    chunk structs: Spark's higher-order functions run INTERPRETED, and
    the measured gap is ~2.4× at full parallelism (10.5 s vs 25.1 s
    for 2M 64-token docs, 8-core pinned), the same finding as the
    MinHash shingler. The HOF
    form is kept (``arrow=False``) as the pure-Column variant usable in
    a fused pass and as the cross-implementation parity check. Both are
    the same deterministic function of the text, so one ANSI-SQL oracle
    reproduces every chunk bit-for-bit for either path.
    """
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap ({overlap_tokens}) < chunk ({chunk_tokens})"
        )
    if arrow:
        c = F.explode(
            _chunks_udf(chunk_tokens, overlap_tokens)(F.col(text_col))
        ).alias("c")
        return df.select(F.col(id_col), c).select(
            id_col, "c.chunk_id", "c.chunk_text", "c.chunk_tokens"
        )
    step = chunk_tokens - overlap_tokens
    tk = tokens(F.col(text_col))
    n = F.size(tk)
    # chunks = ceil((n - overlap) / step), floored at 1 so a doc shorter
    # than the overlap still yields its whole-doc chunk
    n_chunks = F.greatest(
        F.ceil(F.greatest(n - overlap_tokens, F.lit(0)) / F.lit(step)),
        F.lit(1),
    ).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1, F.lit(1))
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(tk, s * step + 1, chunk_tokens), " ")
    )
    return (
        df.filter(n > 0)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text"))
        .withColumn("chunk_tokens", token_count(F.col("chunk_text")))
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = None,
    min_df: int = 1,
    top_n: int | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus vocabulary with term/document frequency and smoothed IDF —
    the table a tokenizer build, stopword discovery, or TF-IDF weighting
    starts from.

    Output: ``(token, tf, df, idf)`` where ``tf`` is total occurrences,
    ``df`` is the number of documents containing the token, and
    ``idf = round(ln((n_docs + 1) / (df + 1)) + 1, 9)`` (sklearn's
    smooth-IDF, quantized so a SQL oracle matches bit-for-bit).
    ``n_docs`` counts ALL input docs, including empty ones.

    Scale story: ONE explode feeding ONE aggregation —
    ``groupBy(token).agg(count, count_distinct(doc))`` plans as
    partial aggregation on (token, doc) map-side, so hot tokens
    ("the") combine before the shuffle and skew never concentrates raw
    occurrence rows on one task. The n_docs scalar joins back as a
    literal-free broadcast (1-row cross join), not a driver collect.
    ``top_n`` ranks by (tf desc, token asc) — deterministic ties —
    planned as TakeOrderedAndProject (per-partition top-k, no global
    sort shuffle).

    Reference parity: no analogue (the reference validates tabular
    submissions); this is part of the beyond-reference text-pipeline
    surface alongside ``text_features``.
    """
    tk = tokens(F.col(text_col))
    if lowercase:
        tk = F.transform(tk, F.lower)
    # deterministic doc identity when the table has one; the mono-id
    # fallback is stable within a run (df only counts distincts)
    doc = (
        F.col(id_col) if id_col is not None else F.monotonically_increasing_id()
    )
    exploded = df.select(doc.alias("_doc"), tk.alias("_tk")).select(
        "_doc", F.explode("_tk").alias("token")
    )
    n_docs = df.select(F.count(F.lit(1)).alias("_n_docs"))
    out = (
        exploded.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct("_doc").alias("df"),
        )
        .filter(F.col("df") >= F.lit(min_df))
        .join(F.broadcast(n_docs))
        .select(
            "token",
            "tf",
            "df",
            F.round(
                F.log((F.col("_n_docs") + 1) / (F.col("df") + 1)) + 1, 9
            ).alias("idf"),
        )
    )
    if top_n is not None:
        out = out.orderBy(F.col("tf").desc(), F.col("token")).limit(top_n)
    return out


def unigram_lm(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    alpha: float = 1.0,
    min_tf: int = 1,
) -> DataFrame:
    """Train a Laplace-smoothed unigram language model: (token, tf,
    logp, oov_logp) where ``logp = ln((tf + alpha) / (total + alpha *
    (V + 1)))`` and ``oov_logp`` is the same with tf = 0 — the CCNet
    recipe's cheap stand-in: train on a trusted reference corpus, score
    a crawl by per-token log-likelihood (:func:`lm_score`), gate on the
    score. ``total``/``V`` count ALL tokens (before ``min_tf`` pruning),
    so pruned tokens score exactly like unseen ones. Log-probs quantize
    to 9 dp (portable to a SQL oracle).

    Plan: one explode → one token aggregation (map-side partials absorb
    hot tokens); total/V attach via a 1-row broadcast, never a collect.
    The vocab-sized counts table is materialized (localCheckpoint) —
    total/V and the model rows both read it, which would otherwise
    re-scan + re-aggregate the training corpus per consumer.
    """
    tk = tokens(F.col(text_col))
    if lowercase:
        tk = F.transform(tk, F.lower)
    counts = (
        df.select(tk.alias("_tk"))
        .select(F.explode("_tk").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    stats = counts.agg(
        F.sum("tf").alias("_total"), F.count(F.lit(1)).alias("_v")
    )
    denom = F.col("_total") + F.lit(alpha) * (F.col("_v") + 1)
    return (
        counts.filter(F.col("tf") >= F.lit(min_tf))
        .join(F.broadcast(stats))
        .select(
            "token",
            "tf",
            F.round(F.log((F.col("tf") + F.lit(alpha)) / denom), 9).alias(
                "logp"
            ),
            F.round(F.log(F.lit(alpha) / denom), 9).alias("oov_logp"),
        )
    )


def lm_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str = "text",
    lowercase: bool = True,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-doc unigram negative log-likelihood against a trained
    :func:`unigram_lm`: (id, n_scored, avg_neg_logp) — lower is more
    reference-like; unseen tokens take the model's OOV floor. Docs with
    zero tokens emit no row (they need no LM to be judged).

    Plan: occurrences compress to (doc, token, count) FIRST (map-side
    partials — a hot token never concentrates raw occurrence rows), the
    model attaches through a broadcast left join (set
    ``broadcast_model=False`` for giant vocabularies: same result, one
    token-keyed shuffle of the compressed pairs), and the per-doc
    aggregate is a count-weighted mean. Two exchanges end-to-end."""
    tk = tokens(F.col(text_col))
    if lowercase:
        tk = F.transform(tk, F.lower)
    occ = (
        df.select(F.col(id_col), tk.alias("_tk"))
        .select(id_col, F.explode("_tk").alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = model.select("token", "logp")
    if broadcast_model:
        m = F.broadcast(m)
    floor = F.broadcast(model.agg(F.min("oov_logp").alias("_oov")))
    lp = F.coalesce(F.col("logp"), F.col("_oov"))
    return (
        occ.join(m, "token", "left")
        .join(floor)
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_scored"),
            F.round(-F.sum(F.col("cnt") * lp) / F.sum("cnt"), 6).alias(
                "avg_neg_logp"
            ),
        )
    )


def bigram_counts(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    min_tf: int = 1,
    top_n: int | None = None,
) -> DataFrame:
    """Adjacent-token pair frequencies — (token_a, token_b, tf) — the
    merge-frequency table one round of BPE/WordPiece training ranks, and
    the collocation table stop-phrase discovery reads. Complements
    :func:`vocabulary` (unigrams).

    Plan: pairs form INSIDE the array (zip_with over two slices — no
    self-join, no positional explode-then-join), then ONE explode into
    ONE (a, b) aggregation with map-side partials absorbing hot pairs
    ("of the"). ``top_n`` ranks (tf desc, token_a, token_b) via
    TakeOrderedAndProject — per-partition top-k, no global sort."""
    tk = tokens(F.col(text_col))
    if lowercase:
        tk = F.transform(tk, F.lower)
    n = F.size("_tk")
    pairs = F.zip_with(
        F.slice("_tk", 1, n - 1),
        F.slice("_tk", 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    out = (
        df.select(tk.alias("_tk"))
        .filter(F.size("_tk") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("token_a"), F.col("p.b").alias("token_b"))
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if min_tf > 1:
        out = out.filter(F.col("tf") >= min_tf)
    if top_n is not None:
        out = out.orderBy(
            F.desc("tf"), F.asc("token_a"), F.asc("token_b")
        ).limit(top_n)
    return out


def bigram_lm_score(
    df: DataFrame,
    train_df: DataFrame,
    id_col: str,
    text_col: str = "text",
    lowercase: bool = True,
    alpha: float = 1.0,
    lam: float = 0.7,
    broadcast_model: bool = True,
) -> DataFrame:
    """Interpolated bigram LM scoring — the context-sensitive step up
    from :func:`lm_score`: per-doc average negative log-likelihood under
    ``lam * p(w_i | w_{i-1}) + (1-lam) * p(w_i)`` (first token scores
    unigram-only), both factors Laplace-smoothed against the SAME vocab
    (V tokens, +1 OOV class): ``p(w) = (tf+a)/(T+a(V+1))``,
    ``p(b|a) = (c(a,b)+a)/(ctx(a)+a(V+1))`` with ``ctx(a)`` = bigram
    occurrences led by ``a`` (0 for unseen contexts — the floor falls
    out of the same formula). Catches word-salad that unigram scoring
    cannot (right words, wrong order). Output: (id, n_scored,
    avg_neg_logp), empty docs emit no row; rounded to 6 dp.

    Plan: training = the :func:`unigram_lm` / :func:`bigram_counts`
    aggregations with vocab-sized tables materialized once
    (localCheckpoint) — the training corpus scans TWICE (token pass +
    pair pass), never more. Scoring compresses the target corpus to
    (doc, a, b, cnt) + one first-token row per doc map-side, attaches
    the three model tables through broadcast left joins
    (``broadcast_model=False`` for giant vocabularies), and reduces
    with one count-weighted mean per doc."""
    tk = tokens(F.col(text_col))
    if lowercase:
        tk = F.transform(tk, F.lower)

    # ---- train (on train_df) -------------------------------------------
    uni = (
        train_df.select(tk.alias("_tk"))
        .select(F.explode("_tk").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    tot = uni.agg(
        F.sum("tf").alias("_T"), F.count(F.lit(1)).alias("_V")
    )
    bi = bigram_counts(train_df, text_col, lowercase=lowercase).localCheckpoint(
        eager=True
    )
    ctx = bi.groupBy(F.col("token_a").alias("_ctx_tok")).agg(
        F.sum("tf").alias("_ctx")
    )
    if broadcast_model:
        uni, bi, ctx = F.broadcast(uni), F.broadcast(bi), F.broadcast(ctx)
    tot = F.broadcast(tot)
    a_ = F.lit(alpha)
    denom_u = F.col("_T") + a_ * (F.col("_V") + 1)
    denom_b = F.coalesce(F.col("_ctx"), F.lit(0)) + a_ * (F.col("_V") + 1)

    # ---- score (on df) --------------------------------------------------
    base = df.select(F.col(id_col), tk.alias("_tk")).filter(
        F.size("_tk") > 0
    )
    n = F.size("_tk")
    pairs = (
        base.select(
            id_col,
            F.explode(
                F.zip_with(
                    F.slice("_tk", 1, n - 1),
                    F.slice("_tk", 2, n - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p"),
        )
        .select(id_col, F.col("p.a").alias("_a"), F.col("p.b").alias("_b"))
        .groupBy(id_col, "_a", "_b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    p_u = (F.coalesce(F.col("tf"), F.lit(0)) + a_) / denom_u
    pair_terms = (
        pairs.join(
            bi.select(
                F.col("token_a").alias("_a"),
                F.col("token_b").alias("_b"),
                F.col("tf").alias("_btf"),
            ),
            ["_a", "_b"],
            "left",
        )
        .join(ctx, F.col("_a") == F.col("_ctx_tok"), "left")
        .join(uni.withColumnRenamed("token", "_b_tok"),
              F.col("_b") == F.col("_b_tok"), "left")
        .join(tot)
        .select(
            id_col,
            "cnt",
            F.log(
                F.lit(lam)
                * ((F.coalesce(F.col("_btf"), F.lit(0)) + a_) / denom_b)
                + F.lit(1.0 - lam) * p_u
            ).alias("lp"),
        )
    )
    first_terms = (
        base.select(id_col, F.element_at("_tk", 1).alias("_w"))
        .join(uni.withColumnRenamed("token", "_w_tok"),
              F.col("_w") == F.col("_w_tok"), "left")
        .join(tot)
        .select(id_col, F.lit(1).alias("cnt"), F.log(p_u).alias("lp"))
    )
    return (
        pair_terms.unionByName(first_terms)
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_scored"),
            F.round(-F.sum(F.col("cnt") * F.col("lp")) / F.sum("cnt"), 6).alias(
                "avg_neg_logp"
            ),
        )
    )


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_df: int = 1,
    lowercase: bool = True,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF — the
    keyword/topic-tag extraction step a curation pipeline runs for
    search facets or cluster labeling, composed from :func:`vocabulary`
    (same tokenization, same smooth-IDF, so the numbers agree with the
    corpus table a user already has).

    Scale story: one explode feeds a (doc, token) count aggregate (ONE
    shuffle with map-side combine — hot tokens pre-sum per partition);
    the IDF attach is a token-keyed equi-join of ids+counts (document
    text never reaches the join); the per-doc top-k is a window over
    doc id — no global sort. ``min_df`` prunes hapax noise AT THE JOIN
    (a token in one doc scores idf_max everywhere and adds nothing as a
    keyword). Deterministic ties: (tfidf desc, token asc); tfidf is
    ``round(tf_doc * idf, 6)`` so a SQL oracle matches bit-for-bit.

    Output: (``id_col``, rank, token, tf_doc, tfidf).
    """
    from pyspark.sql import Window

    vocab = vocabulary(
        df, text_col, id_col=id_col, min_df=min_df, lowercase=lowercase
    ).select("token", "idf")
    tk = tokens(F.col(text_col))
    if lowercase:
        tk = F.transform(tk, F.lower)
    doc_tok = (
        df.select(F.col(id_col).alias("__doc"), F.explode(tk).alias("token"))
        .groupBy("__doc", "token")
        .agg(F.count(F.lit(1)).alias("tf_doc"))
    )
    scored = doc_tok.join(vocab, "token").withColumn(
        "tfidf", F.round(F.col("tf_doc") * F.col("idf"), 6)
    )
    w = Window.partitionBy("__doc").orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__doc").alias(id_col), "rank", "token", "tf_doc", "tfidf"
        )
    )


def token_entropy(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Per-document token Shannon entropy (nats) and type-token ratio —
    the compression-ratio proxy quality signal: gibberish and
    keyword-stuffed documents sit at the extremes of the entropy
    distribution, so curation gates pair this with ``quality_score`` /
    ``repetition_features``.

    Output: ``(id_col, n_tokens, n_distinct, entropy, ttr)`` with
    ``entropy = round(ln(n) - sum(c*ln(c))/n, 9)`` over per-token counts
    ``c`` (0.0 for empty docs) and ``ttr = round(n_distinct/n, 9)``.
    Quantized to 9 dp so an ANSI-SQL oracle matches bit-for-bit.

    Scale story: one explode -> one map-side-combined
    ``groupBy(doc, token)`` count (hot tokens inside a doc combine
    before the shuffle) -> one ``groupBy(doc)`` reduction of three
    scalars. Text shuffles only as (doc, token) pairs; the final
    left join re-attaching empty docs carries two BIGINT columns.
    Requires unique ``id_col`` values.

    Reference parity: none (beyond-reference text-pipeline surface,
    same family as ``quality_score`` — SURVEY §2 text analysis).
    """
    tk = tokens(F.col(text_col))
    if lowercase:
        tk = F.transform(tk, F.lower)
    per_token = (
        df.select(F.col(id_col).alias("__doc"), F.explode(tk).alias("token"))
        .groupBy("__doc", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = per_token.groupBy("__doc").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("c") * F.log(F.col("c"))).alias("_clogc"),
    )
    return (
        df.select(F.col(id_col).alias("__doc"))
        .join(per_doc, "__doc", "left")
        .select(
            F.col("__doc").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            F.when(
                F.col("n_tokens").isNull(), F.lit(0.0)
            ).otherwise(
                F.round(
                    F.log(F.col("n_tokens")) - F.col("_clogc") / F.col("n_tokens"), 9
                )
            ).alias("entropy"),
            F.when(F.col("n_tokens").isNull(), F.lit(0.0)).otherwise(
                F.round(F.col("n_distinct") / F.col("n_tokens"), 9)
            ).alias("ttr"),
        )
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_docs: int = 10,
    min_chars: int = 4,
    delimiter: str = "\n",
    broadcast_removal: bool = True,
) -> DataFrame:
    """Corpus-level boilerplate line removal (the C4/CCNet recipe):
    a line whose trimmed form appears in >= ``min_docs`` DISTINCT
    documents is navigation/footer boilerplate ("subscribe to our
    newsletter") and is deleted from every document; lines shorter than
    ``min_chars`` after trim are exempt (never counted, never removed).

    Output: the input columns with ``text_col`` replaced by the cleaned
    text (kept lines re-joined with ``delimiter``, original order) plus
    ``n_lines`` / ``n_removed`` counts. Requires unique ``id_col``.

    Scale story: the corpus text NEVER shuffles. Pass 1 explodes lines
    to (md5-fingerprint, doc) pairs only — the distinct-doc count
    partial-aggregates map-side, so a footer shared by 10^9 pages does
    not concentrate raw rows. The flagged sliver (boilerplate is tiny
    by definition) broadcasts onto the pairs to build per-doc removal
    sets — (doc, set<fp>) rows, each set bounded by the doc's own line
    count — which re-attach to the ORIGINAL rows via a broadcast left
    join (map-only; set ``broadcast_removal=False`` to fall back to a
    shuffle join when most docs carry boilerplate). The rebuild is a
    native ``filter``/``array_join`` projection — zero UDFs, zero
    exchanges for the corpus in the default path.

    Reference parity: none (beyond-reference curation surface; the
    text analogue of the crossmodal boilerplate-caption flags in
    ops/crossmodal.py).
    """
    line_trim = F.trim(F.col("_line"))
    fp = F.when(
        F.length(line_trim) >= min_chars, F.md5(line_trim)
    )
    pairs = (
        df.select(
            F.col(id_col).alias("__doc"),
            F.explode(F.split(F.col(text_col), delimiter)).alias("_line"),
        )
        .select("__doc", fp.alias("_fp"))
        .filter(F.col("_fp").isNotNull())
    )
    flagged = (
        pairs.groupBy("_fp")
        .agg(F.count_distinct("__doc").alias("_ndocs"))
        .filter(F.col("_ndocs") >= F.lit(min_docs))
        .select("_fp")
    )
    removal = (
        pairs.join(F.broadcast(flagged), "_fp")
        .groupBy("__doc")
        .agg(F.collect_set("_fp").alias("_bp"))
    )
    if broadcast_removal:
        removal = F.broadcast(removal)
    joined = df.join(
        removal, df[id_col] == removal["__doc"], "left"
    ).drop("__doc")
    arr = F.split(F.col(text_col), delimiter)
    is_bp = lambda l: F.coalesce(  # noqa: E731
        (F.length(F.trim(l)) >= min_chars)
        & F.array_contains(F.col("_bp"), F.md5(F.trim(l))),
        F.lit(False),
    )
    kept = F.filter(arr, lambda l: ~is_bp(l))
    out_cols = [
        F.array_join(kept, delimiter).alias(text_col) if c == text_col else c
        for c in df.columns
    ]
    return joined.select(
        *out_cols,
        F.size(arr).alias("n_lines"),
        (F.size(arr) - F.size(kept)).alias("n_removed"),
    )
