"""URL/domain operators for crawl curation: feature extraction
(scheme/host/registered-domain/path-depth/query-params) and
blocklist-domain filtering.

Everything is native Column expressions over Java-and-RE2-portable
regex patterns (no ``parse_url`` — its Java-URI edge semantics are not
reproducible in an ANSI-SQL oracle), so the whole pass stays inside
whole-stage codegen: zero UDFs, zero exchanges.

Reference parity: none (beyond-reference curation surface — per-domain
caps/blocklists are the standard first gate of a web-crawl pipeline;
composes with ``sample.cap_per_key`` for per-domain corpus caps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# portable patterns (valid in Java regex AND RE2/DuckDB)
_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY = r"\?([^#]*)"
_REG_DOMAIN = r"([^.]+\.[^.]+)$"


def scheme(col: Column) -> Column:
    return F.regexp_extract(F.coalesce(col, F.lit("")), _SCHEME, 1)


def host(col: Column) -> Column:
    """Hostname without userinfo/port; '' when the URL has no scheme."""
    return F.regexp_extract(F.coalesce(col, F.lit("")), _HOST, 1)


def registered_domain(col: Column) -> Column:
    """Last two dot-labels of the host ('docs.example.com' ->
    'example.com'); a dotless host is its own registered domain. A
    public-suffix-list lookup (for 'example.co.uk') slots in as a
    broadcast map join where precision matters; the 2-label heuristic
    is the deterministic, dependency-free default."""
    h = host(col)
    two = F.regexp_extract(h, _REG_DOMAIN, 1)
    return F.when(two != "", two).otherwise(h)


def path_depth(col: Column) -> Column:
    """Number of non-empty path segments ('/a/b/' -> 2)."""
    p = F.regexp_extract(F.coalesce(col, F.lit("")), _PATH, 1)
    return F.size(F.filter(F.split(p, "/"), lambda s: s != ""))


def n_query_params(col: Column) -> Column:
    q = F.regexp_extract(F.coalesce(col, F.lit("")), _QUERY, 1)
    return F.when(q == "", F.lit(0)).otherwise(F.size(F.split(q, "&")))


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach (scheme, host, domain, path_depth, n_params) columns.

    Scale story: one fused map-only projection — regex extraction and
    the split/filter HOFs all compile to whole-stage codegen; the plan
    adds zero exchanges and zero Python stages.
    """
    u = F.col(url_col)
    return df.select(
        "*",
        scheme(u).alias("scheme"),
        host(u).alias("host"),
        registered_domain(u).alias("domain"),
        path_depth(u).alias("path_depth"),
        n_query_params(u).alias("n_params"),
    )


def flag_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Add ``is_blocked``: true when the URL's registered domain appears
    in ``blocklist`` (one ``domain_col`` string column).

    Scale story: the blocklist (thousands of domains vs 10^12 rows)
    broadcasts; the corpus takes one map-side hash-join probe — no
    shuffle. Blocklist domains are matched case-insensitively (hosts
    lowercase on both sides).
    """
    bl = F.broadcast(
        blocklist.select(
            F.lower(F.col(domain_col)).alias("__bl_domain")
        ).distinct().withColumn("__hit", F.lit(True))
    )
    dom = F.lower(registered_domain(F.col(url_col)))
    return (
        df.withColumn("__dom", dom)
        .join(bl, F.col("__dom") == F.col("__bl_domain"), "left")
        .select(
            *df.columns,
            F.coalesce(F.col("__hit"), F.lit(False)).alias("is_blocked"),
        )
    )


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted (broadcast
    left-anti — same map-side probe as :func:`flag_blocked_domains`)."""
    bl = F.broadcast(
        blocklist.select(
            F.lower(F.col(domain_col)).alias("__bl_domain")
        ).distinct()
    )
    dom = F.lower(registered_domain(F.col(url_col)))
    return (
        df.withColumn("__dom", dom)
        .join(bl, F.col("__dom") == F.col("__bl_domain"), "left_anti")
        .drop("__dom")
    )
