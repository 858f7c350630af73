"""Physical-plan audit — generates PLANS.md from live explain output.

For each audited query this extracts the scale-relevant plan facts:
which filters reached the parquet scan (PushedFilters), which columns
the scan reads (ReadSchema — column pruning), every join node and its
strategy (broadcast vs sort-merge), the number of shuffle Exchanges,
WholeStageCodegen coverage, and ArrowEvalPython (Python UDF) stages.

The point (task brief: ".explain() the plan and iterate until it's the
plan you'd want") is a reviewable record that each headline query runs
the intended physical shape — e.g. the image suite reads `bytes` only in
the decode branch, lookup joins broadcast, and the fused pass is one scan.

Usage: python tools/audit_plans.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from smcchecker_spark.session import get_spark  # noqa: E402

AUDITED = [
    "engine_suite_documents",
    "engine_embedding_suite",
    "engine_image_policy",
    "engine_dtype_orders",
    "engine_dup_production",
    "pricing_summary",
    "revenue_by_region",
    "semi_join_orders",
    "window_topk_orders",
    "stats_exact_lineitem",
    "column_stats_approx",
    "psi_value_drift",
    "exact_dups_docs",
    "dedup_substrings_docs",
    "dedup_substrings_long_docs",
    "phab_star_join",
    "minhash_neardup_docs",
    "topk_cosine",
    "topk_cosine_partial",
    "simhash_neardup_docs",
    "phash_neardup_events",
    "embedding_neardup",
    "semdedup_clustered",
    "images_validate",
    "metrics_drift",
    "sessionize_events",
    "sliding_window_events",
    "corpus_report",
    "embedding_drift",
    "image_decontaminate_events",
    "det_split_docs",
    "mix_budget_docs",
    "repetition_docs",
    "contamination_docs",
    "pack_docs",
    "image_batches_events",
    "engine_conditional_docs",
    "violations_sampled_docs",
    "hll_ndv_events",
    "cap_per_source_docs",
    "chunk_docs",
    "asof_purchase_events",
    "asof_next_purchase_events",
    "zorder_events",
    "bloom_anti_events",
    "weighted_sample_events",
    "corpus_rollup",
    "expectations_lineitem",
    "topk_per_user_events",
    "row_diff_events",
    "skew_join_events",
    "dedup_resolve_quality_docs",
    "pivot_user_events",
    "unpivot_lineitem",
    "except_intersect_docs",
    "dataset_card_docs",
    "vocab_docs",
    "tfidf_keywords_docs",
    "token_entropy_docs",
    "boilerplate_docs",
    "url_features_docs",
    "budget_select_docs",
    "incremental_neardup_docs",
    "leakage_split_docs",
    "lm_quality_docs",
    "union_evolution_events",
    "engine_robust_outliers",
    "bigram_counts_docs",
    "pca_embeddings",
    "rank_normalize_events",
    "impute_events",
    "winsorize_events",
    "curate_images_events",
    "cat_drift_events",
    "engine_outliers_per_key",
    "incremental_phash_events",
    "impute_mode_events",
    "bigram_lm_docs",
    "engine_fd_events",
    "engine_json_events",
    "fd_discovery_events",
    "jpeg_validate",
    "webp_validate",
    "transcode_images",
    "pq_encode_embeddings",
    "pq_topk_embeddings",
    "ivfpq_topk_exhaustive",
    "shard_docs",
    "audio_features_events",
    "video_neardup_events",
    "audio_validate",
    "video_validate",
    "entropy_events",
    "mutual_info_events",
    "corr_matrix_lineitem",
    "kmeans_cells_embeddings",
    "metric_anomalies_events",
    "exif_validate",
    "jpeg_prog_validate",
]

JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)"
    r"\s+[^,\n]*?(Inner|LeftAnti|LeftSemi|LeftOuter|FullOuter|Cross)?",
)


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# Static explain('formatted') prints each consumer of a shared subtree
# separately; queries whose physical plan dedupes those consumers at
# runtime (AQE ReuseExchange) get a note so the static counts aren't
# read as the executed dataflow.
NOTES = {
    "simhash_neardup_docs": (
        "static plan prints the bucket aggregate's 3 consumers "
        "(small, hot-probe, hot-build) as separate subtrees; the "
        "EXECUTED plan reuses one exchange — 1 ArrowEvalPython + "
        "ReusedExchange, asserted in "
        "tests/test_plans.py::test_simhash_pairs_single_udf_pass"
    ),
    "phash_neardup_events": (
        "static plan prints the bucket aggregate's 3 consumers "
        "(small, hot-probe, hot-build) as separate subtrees; the "
        "EXECUTED plan reuses one exchange — zero Python stages, 1 "
        "scan + ReusedExchange, asserted in "
        "tests/test_plans.py::test_phash_near_dups_no_udf_single_scan"
    ),
    "phab_star_join": (
        "the PHAB flagship 11-13 relation star (verdict item 4): ALL "
        "dims broadcast (19 BroadcastHashJoin instances incl. the "
        "supplier-side nation/region aliases and the geometry LEFT "
        "join), fact spine joins once per branch; EXECUTED plan has "
        "exactly 2 shuffle exchanges — one personnel-concat window "
        "per branch, partitioned on the join's own orderkey. The "
        "static double-printed join tree is the field/habitat UNION "
        "ALL: in the reference these are two DIFFERENT fact tables "
        "(FieldResult/HabitatResult), each scanned once — the shared "
        "lineitem stand-in double-scans only because one table plays "
        "both roles. Locked in tests/test_plans.py"
    ),
    "dedup_substrings_long_docs": (
        "seed-and-extend long-passage dedup: seeds pair through the "
        "same bucketed_pairs exchange-reuse discipline as the banded "
        "dedups; every post-tokenize shuffle carries (hash|ids, "
        "positions) only — window text never rides a shuffle"
    ),
    "semdedup_clustered": (
        "static plan re-expands the 3-branch union base into every "
        "consumer and prints the chunk-block join's probe/build "
        "subtrees separately; EXECUTED dataflow: one cell-assignment "
        "UDF pass, one cell groupBy shuffle, blocked-GEMM scoring in "
        "mapInPandas emitting only >=threshold pairs, then components "
        "rounds each materialized via eager localCheckpoint — the "
        "scan/exchange counts here overstate the runtime plan"
    ),
}


def audit_one(name: str, df) -> str:
    txt = plan_text(df)
    scans = len(re.findall(r"\(\d+\) Scan parquet", txt))
    pushed = sorted(
        {
            m.strip()
            for m in re.findall(r"PushedFilters: \[([^\]]*)\]", txt)
            if m.strip()
        }
    )
    read_schemas = sorted(
        {m.split("struct<")[-1].rstrip(">") for m in re.findall(r"ReadSchema: ([^\n]+)", txt)}
    )
    joins = sorted(
        {
            m[0] + (f" {m[1]}" if m[1] else "")
            for m in re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin)(?: (\w+))?(?: Build\w+)? \(\d+\)",
                txt,
            )
        }
    )
    exchanges = len(re.findall(r"\(\d+\) Exchange", txt))
    codegen = len(set(re.findall(r"codegen id : (\d+)", txt)))
    arrow = len(
        re.findall(
            r"\(\d+\) (?:ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|"
            r"FlatMapGroupsInPandasWithState|PythonMapInArrow)",
            txt,
        )
    )
    aqe = "AdaptiveSparkPlan" in txt

    lines = [f"## {name}", ""]
    lines.append(f"- scans: {scans}; shuffle exchanges: {exchanges}; "
                 f"codegen spans: {codegen or 'n/a (pre-AQE plan)'}; "
                 f"Python/Arrow stages: {arrow}; "
                 f"AQE: {'on' if aqe else 'off'}")
    if joins:
        lines.append(f"- joins: {'; '.join(joins)}")
    if pushed:
        lines.append(f"- pushed filters: {'; '.join(pushed)}")
    for rs in read_schemas:
        lines.append(f"- read schema: `{rs[:160]}`")
    if name in NOTES:
        lines.append(f"- note: {NOTES[name]}")
    lines.append("")
    return "\n".join(lines)


def main(sf_dir: str) -> None:
    spark = get_spark("audit-plans")
    qs = entry_mod.queries()
    out = [
        "# PLANS — physical-plan audit of the headline queries",
        "",
        f"Generated by `python tools/audit_plans.py {sf_dir}` against live",
        "explain('formatted') output; regenerate after any operator change.",
        "",
    ]
    for name in AUDITED:
        df = qs[name](spark, sf_dir)
        out.append(audit_one(name, df))
    out.append(_resume_pruning_section(spark))
    print("\n".join(out))
    spark.stop()


def _resume_pruning_section(spark) -> str:
    """Live evidence for SURVEY §4.5: the checkpoint-resume predicate
    prunes completed partitions AT THE SOURCE on a partitioned layout
    (hive parquet here; Iceberg manifest pruning behaves the same on the
    cluster — see smcchecker_spark/tables.py)."""
    import re
    import tempfile

    from pyspark.sql import functions as F

    from smcchecker_spark import fixtures
    from smcchecker_spark.tables import ParquetTable, resume_filter

    root = tempfile.mkdtemp(prefix="plans_resume_")
    src = ParquetTable(f"{root}/img", partition_by=["part_id"])
    src.overwrite(fixtures.generate_images(spark, n_rows=120, n_parts=6))
    pruned = resume_filter(src.read(spark), {0, 1, 2, 3}, "part_id")
    txt = pruned.select("image_id")._jdf.queryExecution().explainString(
        pruned._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", txt)
    n_files = pruned.select(F.input_file_name()).distinct().count()
    return "\n".join([
        "## resume partition pruning (checkpoint §4.5)",
        "",
        "Partitioned source (hive parquet stand-in for Iceberg), 6",
        "partitions, 4 committed in the checkpoint; the resume predicate",
        "plans as a SOURCE partition filter — finished partitions cost",
        "zero I/O on resume:",
        "",
        f"- PartitionFilters: `{pf.group(1) if pf else 'MISSING'}`",
        f"- files scanned after pruning: {n_files} (2 unfinished partitions)",
        "- locked by tests/test_checkpoint.py::test_resume_scan_partition_pruned",
        "",
    ])


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
