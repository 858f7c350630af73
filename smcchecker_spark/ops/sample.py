"""Deterministic sampling and split assignment for training-data pipelines.

Everything here is a pure narrow projection — NO shuffle, NO rand().
Training pipelines need splits/samples that are

- **stable under re-runs and resume**: a checkpoint-resumed job must put
  every row in the same split as the first attempt (``F.rand`` re-draws
  per task attempt; a content hash never moves),
- **stable under repartitioning**: adding executors or compacting files
  must not change membership (per-partition RNG streams do),
- **independent across uses**: the dedup fingerprint and the split
  bucket must not correlate (salt the hash per purpose).

The bucket function is md5-based so an ANSI-SQL oracle (DuckDB) can
reproduce every assignment bit-for-bit — the whole module is
oracle-checkable, unlike RNG sampling.

Reference parity note: the reference engine (SCCWRP/smcchecker) has no
sampling surface — this is part of the beyond-reference training-data
pipeline layer the brief asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 10^6 buckets: split fractions are honored to ±1e-6 of the hash space,
# and 15 hex digits (60 bits) of md5 keep the bucket math in a BIGINT so
# the DuckDB oracle expression ('0x'||substr(md5(x),1,15))::BIGINT matches.
_BUCKETS = 1_000_000


def hash_bucket(col: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 1e6) from the md5 of ``salt || value``.

    md5 (not xxhash64) is deliberate: it exists with identical semantics
    in every SQL engine, so assignments are portable and auditable. The
    hash runs once per row inside whole-stage codegen — for a 10^12-row
    scan this is a map-only pass, no exchange.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return (h % _BUCKETS).cast("int")


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by content hash of ``id_col``.

    The filter is a plain comparison on a codegen'd expression, so it
    pushes below everything Catalyst can move it below and costs one
    map-only pass. Unlike ``df.sample`` the selection is a FUNCTION OF
    THE ROW — re-runs, resumes, and repartitions keep the same rows.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(hash_bucket(F.col(id_col), salt) < int(fraction * _BUCKETS))


def det_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label (train/val/test/...) by hash range.

    ``fractions`` maps label → share; shares must sum to 1 (±1e-9).
    Labels are assigned to contiguous bucket ranges in SORTED label
    order, so the mapping is a pure function of (id, salt, fractions) —
    documented and reproducible by the SQL oracle. One CASE expression,
    map-only; at 10^12 rows this adds nothing to the scan.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    b = hash_bucket(F.col(id_col), salt)
    expr = None
    hi = 0
    for label in sorted(fractions):
        hi += int(round(fractions[label] * _BUCKETS))
        cond = b < F.lit(hi)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(
            cond, F.lit(label)
        )
    # rounding can leave a sliver of buckets above the last boundary;
    # fold it into the (sorted-) last label so every row gets a split
    last = sorted(fractions)[-1]
    return df.withColumn(split_col, expr.otherwise(F.lit(last)))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling (the scalable ``sampleBy``).

    ``fractions`` maps stratum value → keep fraction; strata not listed
    keep ``default_fraction``. The per-stratum threshold is a literal
    CASE map — no join, no shuffle, map-only — so skewed strata cost
    nothing extra (contrast ``sampleBy``, which is also map-only but
    RNG-based and thus unstable under retry/resume).
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0,1], got {v}")
    pairs: list[Column] = []
    for k in sorted(fractions):
        pairs.append(F.lit(str(k)))
        pairs.append(F.lit(int(fractions[k] * _BUCKETS)))
    thresh = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col).cast("string")],
        F.lit(int(default_fraction * _BUCKETS)),
    )
    return df.filter(hash_bucket(F.col(id_col), salt) < thresh)


def budget_mix_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weight_col: str,
    target_shares: dict[str, float],
    budget: float,
    salt: str = "mix",
) -> DataFrame:
    """Sample a training MIX: pick rows so each stratum contributes
    ~``target_shares[stratum] * budget`` total ``weight_col`` (e.g.
    tokens), assuming per-stratum weight is roughly i.i.d. across rows.

    Two stages:

    1. one groupBy on the stratum → per-stratum totals (output is
       |strata| rows — tiny; partial aggregation absorbs stratum skew),
       collected to the driver to compute keep fractions
       ``min(1, share*budget/total)``;
    2. :func:`stratified_hash_sample` with those fractions — map-only.

    The collect is bounded by the number of strata (sources/domains:
    thousands at most), never by rows — this is the legitimate
    "aggregate to driver, broadcast a literal plan back" pattern.
    Oversubscribed strata (share*budget > available weight) keep
    everything; honoring the budget exactly would require upsampling,
    which is a caller decision.
    """
    totals = {
        r["s"]: r["w"]
        for r in df.groupBy(F.col(strata_col).cast("string").alias("s"))
        .agg(F.sum(weight_col).alias("w"))
        .collect()
    }
    # a TARGETED stratum that exists but has no usable weight (all-NULL
    # weight_col — e.g. a pending tokenizer backfill — or total <= 0)
    # must fail loudly: silently assigning it fraction 0 would drop that
    # entire slice of the intended training mix with no signal
    broken = sorted(
        s for s in target_shares
        if s in totals and not (totals[s] and totals[s] > 0)
    )
    if broken:
        raise ValueError(
            f"strata {broken} have rows but no positive total "
            f"{weight_col!r} (all NULL or <= 0); cannot honor their "
            "target shares — backfill the weight column or drop them "
            "from target_shares"
        )
    fractions = {
        s: min(1.0, (share * budget) / totals[s])
        for s, share in target_shares.items()
        if s in totals
    }
    return stratified_hash_sample(df, id_col, strata_col, fractions, salt=salt)


def cap_per_key(
    df: DataFrame,
    id_col: str,
    key_col: str,
    cap: int,
    salt: str = "cap",
    exact: bool = True,
) -> DataFrame:
    """Keep at most ``cap`` rows per ``key_col`` value — the corpus
    balancing op ("max N documents per domain") that stops a handful of
    boilerplate-heavy hosts from dominating a web-scale training mix.

    Which rows survive is a pure function of the data: rows are ranked
    within their key by ``(hash_bucket(id, salt), id)`` — a deterministic
    total order, so re-runs, resumes, and repartitions keep the same
    rows, and an ANSI-SQL oracle reproduces the selection bit-for-bit.

    Skew discipline (``exact=True``): a naive window row_number sorts
    EVERY row by (key, md5-bucket, id) — an md5 evaluation plus a
    three-way comparison per corpus row. Instead an order-free count
    window splits the input (its required sort is by the key alone: no
    md5, and degenerate on a hot key's all-equal run): keys with ≤
    ``cap`` rows pass through WHOLESALE — their row_number could never
    exceed the cap — and only oversized keys' rows reach the
    hash-ordered ranking window. Domain distributions are heavy-tailed,
    so the expensive sort shrinks from |corpus| to the few oversized
    keys' rows. Both branches share one scan and ONE exchange: they
    filter the same counted subplan, which is hash-partitioned on the
    key exactly as the ranking window requires (ReuseExchange;
    plan-asserted in tests). No formulation of an exact per-key rank
    can spread ONE key across tasks — a key whose rows overflow a task
    belongs in ``exact=False``.

    ``exact=False``: for corpora where even one key's rows overflow a
    task (billions of rows under one registrable domain), rank-by-sort
    is the wrong tool. The threshold mode keeps rows whose hash bucket
    falls below ``cap/count`` of the bucket space — one count window +
    a filter, NO ranking sort — yielding ~``cap`` rows per oversized
    key (binomial error ~sqrt(cap)). Same determinism properties; the
    kept set is not a prefix of the exact mode's.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window

    b = hash_bucket(F.col(id_col), salt)
    counted = df.withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(key_col))
    )
    if not exact:
        # ceil, so cap >= count keeps everything (threshold = _BUCKETS)
        thresh = F.ceil(F.lit(cap) * F.lit(_BUCKETS) / F.col("__n"))
        return counted.filter(
            (F.col("__n") <= cap) | (b < thresh)
        ).drop("__n")
    small = counted.filter(F.col("__n") <= cap).drop("__n")
    big = counted.filter(F.col("__n") > cap).drop("__n")
    w = Window.partitionBy(key_col).orderBy(b.asc(), F.col(id_col).asc())
    capped = (
        big.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )
    return small.unionByName(capped)


def weighted_sample_per_key(
    df: DataFrame,
    id_col: str,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sample WITHOUT replacement of ``k`` rows per key —
    selection probability proportional to ``weight_col`` (Efraimidis &
    Spirakis A-Res: rank rows by u^(1/w) for uniform u, keep the top k;
    equivalently by ln(u)/w, used here for numeric range). The uniform
    draw is the md5 hash bucket, so like everything in this module the
    sample is a pure function of (id, salt) — stable under re-runs,
    resume, and repartitioning — and reproducible by an ANSI-SQL oracle.

    The priority is ROUNDED to 9 decimals before ranking (ties then
    break by id): pow/log differ across engines in the last ulp, and an
    unquantized order would let a 1-ulp flip change which row ranks
    k-th. Nine digits leave the selection statistically indistinguishable
    while making the order engine-portable and replay-exact.

    Rows with NULL or non-positive weight are EXCLUDED — they carry zero
    selection mass (w→0⁺ ⇒ priority → -∞), and admitting them would make
    "proportional to weight" silently false. Same skew caveat as
    ``cap_per_key`` exact mode: one key's ranking sort is one task's
    work; the count-window wholesale split applies here too (keys with
    ≤ k weighted rows keep them all, no sort).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    u = (hash_bucket(F.col(id_col), salt) + F.lit(0.5)) / F.lit(float(_BUCKETS))
    pri = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    eligible = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col).cast("double") > 0)
    )
    counted = eligible.withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(key_col))
    )
    small = counted.filter(F.col("__n") <= k).drop("__n")
    big = counted.filter(F.col("__n") > k).drop("__n")
    w = Window.partitionBy(key_col).orderBy(
        pri.desc(), F.col(id_col).asc()
    )
    picked = (
        big.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    return small.unionByName(picked)


def select_within_budget(
    df: DataFrame,
    score_col: str,
    size_col: str,
    budget: int,
    id_col: str,
    num_ranges: int | None = None,
    cum_col: str = "cum_size",
) -> DataFrame:
    """Greedy corpus selection under a global size budget: rank docs by
    (``score_col`` desc, ``id_col`` asc) and keep rows while the
    INCLUSIVE running total of ``size_col`` stays ≤ ``budget`` — "take
    the best documents until the token budget is spent", the selection
    step of quality-ranked pre-training data curation. Output keeps all
    input columns plus ``cum_col`` (this row's inclusive running total).

    Deterministic: the (score desc, id asc) order is total (``id_col``
    must be unique, non-null), so membership is a pure function of the
    data — independent of partitioning, parallelism, and resume. NULL
    scores rank last (selected only if budget remains after every
    scored doc); NULL sizes count 0.

    Scale story: the naive ``sum() over (order by score)`` is a
    single-partition global sort. This uses the same two-pass
    distributed prefix sum as :func:`smcchecker_spark.ops.pack.pack_sequences`:
    approxQuantile score boundaries split the corpus into P ranges
    (ties can't straddle a range); pass 1 computes per-range size
    totals over a 2-column scan (P rows to the driver); pass 2 runs the
    running sum inside each range (P-way parallel window, streaming
    frame) and adds the higher-ranges offset as a literal CASE. Ranges
    whose offset already exceeds the budget are entirely filtered by
    the final predicate — at 100 TB the selected head is a handful of
    ranges and AQE prunes the rest after the filter.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    from pyspark.sql import Window

    from smcchecker_spark.ops.pack import _range_id

    spark = df.sparkSession
    p = num_ranges or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    quantiles = [i / p for i in range(1, p)]
    bounds = (
        df.select(F.col(score_col).cast("double").alias("s"))
        .approxQuantile("s", quantiles, 0.001)
        if p > 1
        else []
    )
    boundaries = sorted(set(bounds))

    rid = _range_id(F.col(score_col).cast("double"), boundaries)
    size = F.coalesce(F.col(size_col).cast("long"), F.lit(0))

    totals = {
        r["_rid"]: r["_t"]
        for r in df.select(rid, size.alias("_s"))
        .groupBy("_rid")
        .agg(F.sum("_s").alias("_t"))
        .collect()
    }
    # global order is score DESC: offsets accumulate from the TOP range
    # (highest rid) downward; NULL scores fold into rid 0 and sort after
    # that range's real scores via desc_nulls_last
    offsets: dict[int, int] = {}
    acc = 0
    for i in range(len(boundaries), -1, -1):
        offsets[i] = acc
        acc += totals.get(i, 0)

    offset_expr = F.lit(0)
    for i, off in offsets.items():
        offset_expr = F.when(F.col("_rid") == i, F.lit(off)).otherwise(offset_expr)
    w = (
        Window.partitionBy("_rid")
        .orderBy(F.col(score_col).desc_nulls_last(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (offset_expr + F.sum(size).over(w)).cast("long")
    # a range whose exclusive offset already exceeds the budget cannot
    # contribute any row (cum >= offset); filtering on _rid BEFORE the
    # window pushes the prune below the exchange — unselected ranges
    # never shuffle or sort
    viable = [i for i, off in offsets.items() if off <= budget]
    return (
        df.withColumn("_rid", rid)
        .filter(F.col("_rid").isin(viable))
        .withColumn(cum_col, cum)
        .filter(F.col(cum_col) <= F.lit(budget))
        .drop("_rid")
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    fractions: dict[str, float],
    salt: str = "split",
    split_col: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
    broadcast_components: bool = True,
) -> DataFrame:
    """Train/val/test split that never lets near-duplicates straddle
    splits: every member of a dup CLUSTER (connected component of
    ``pairs``) hashes on the cluster's canonical (min) id, so the whole
    cluster lands in one split — the eval-contamination guard that a
    plain per-row split (:func:`det_split`) cannot give. Docs in no pair
    hash on their own id (identical to ``det_split`` for them).

    Assignment is a pure function of (data, salt, fractions): the
    component labels are deterministic (min id over the closure) and the
    bucket hash is the portable md5 idiom — stable under re-runs,
    resume, and repartitioning, reproducible by a SQL oracle.

    Scale: the components table holds only ids that appear in a pair —
    the dup-graph sliver, orders of magnitude smaller than the corpus —
    and attaches through a broadcast left join (map-only for the corpus;
    set ``broadcast_components=False`` for pathologically dup-heavy
    corpora, where it degrades to one hash join on the id). The split
    CASE itself is codegen'd, no extra pass.
    """
    from smcchecker_spark.ops.dedup import connected_components

    comp = connected_components(pairs, id_a=id_a, id_b=id_b).select(
        F.col("id").alias("__cid"), F.col("component").alias("__component")
    )
    if broadcast_components:
        comp = F.broadcast(comp)
    canon = F.coalesce(F.col("__component"), F.col(id_col))
    out = (
        df.join(comp, F.col(id_col) == F.col("__cid"), "left")
        .withColumn("__canon", canon)
        .drop("__cid", "__component")
    )
    return det_split(
        out, "__canon", fractions, salt=salt, split_col=split_col
    ).drop("__canon")


def rank_normalize(
    df: DataFrame,
    key_cols: list[str],
    score_col: str,
    out_col: str = "score_pct",
) -> DataFrame:
    """Per-key percentile normalization: ``out_col`` = fraction of the
    key group's rows with score ≤ this row's score (inclusive CDF —
    SQL's ``cume_dist()``), rounded to 9 dp. The cross-source
    calibration step quality-mix sampling needs: raw quality scores are
    not comparable across sources (each scorer has its own scale), their
    within-source percentiles are. NULL scores get NULL (excluded from
    the denominator).

    Scale story: NOT a per-row window. Rows first compress to distinct
    (key, score) counts (map-side partials — a hot score value never
    concentrates rows), the running CDF is a window over those DISTINCT
    values (bounded by per-key score cardinality, orders of magnitude
    below row count for real quality scores), and rows re-attach by
    (key, score) equi-join. A per-row ``cume_dist`` window would sort
    every row of a hot source in one task; here the hot source's rows
    only flow through a hash join. NULL keys also get NULL (the
    equi-join re-attach is not null-safe by design — a NULL source is
    not a population to normalize within).
    """
    from pyspark.sql import Window

    sc = F.col(score_col)
    counts = (
        df.filter(sc.isNotNull())
        .groupBy(*key_cols, score_col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wk = Window.partitionBy(*key_cols)
    cdf = counts.select(
        *key_cols,
        score_col,
        F.round(
            F.sum("__n").over(w) / F.sum("__n").over(wk), 9
        ).alias(out_col),
    )
    return df.join(cdf, [*key_cols, score_col], "left")
