"""End-to-end /upload lifecycle parity (SURVEY.md §3.1): a multi-sheet
submission goes match → preprocess (trim + case-fix) → core checks →
custom-tier gating → verdicts, mirroring /root/reference/proj/main.py's
pipeline shape with the engine's Spark-native steps."""

from pyspark.sql import functions as F

from smcchecker_spark import clean
from smcchecker_spark.constraints import (
    InLookup,
    MaxLength,
    NotNull,
    Suite,
    ValidationContext,
)
from smcchecker_spark.match import match
from smcchecker_spark.run import ValidationRunner

SCHEMAS = {
    "tbl_images": ["image_id", "fmt", "caption", "part_id"],
}
DATASETS = {"images": ["tbl_images"]}


def test_upload_lifecycle(spark):
    # 1. ingest: one "sheet" with messy values — padded whitespace,
    # wrong-case fmt, one NULL caption, one overlong caption
    rows = [
        ("i1", "  PNG ", "a caption", 0),
        ("i2", "jpeg", None, 0),
        ("i3", "png", "x" * 30, 1),
        ("i4", "bmp", "ok", 1),  # fmt not in lookup
    ]
    sheet = spark.createDataFrame(
        rows, "image_id string, fmt string, caption string, part_id int"
    )

    # 2. match (exact column-set → table name, dataset selection)
    dataset, report, dfs = match({"Sheet1": sheet}, SCHEMAS, DATASETS)
    assert dataset == "images" and set(dfs) == {"tbl_images"}
    assert all(e.matched for e in report)

    # 3. preprocess: trim + case-fix fmt against the lookup
    lu = spark.createDataFrame([("png",), ("jpeg",)], "fmt string")
    cleaned = clean.clean_data(
        dfs["tbl_images"], case_fix_lookups={"fmt": (lu, "fmt")}
    )
    got_fmts = {r["image_id"]: r["fmt"] for r in cleaned.collect()}
    assert got_fmts["i1"] == "png"  # trimmed AND case-fixed
    assert got_fmts["i4"] == "bmp"  # no lookup match → left as-is

    # 4+5. core checks + custom tier (gated per partition) + verdicts
    suite = Suite(
        name="images_core",
        table="tbl_images",
        constraints=[
            NotNull("caption"),
            MaxLength("caption", max_length=20),
            InLookup("fmt", lookup="lu_fmt", lookup_key="fmt"),
        ],
        custom_constraints=[NotNull("image_id")],
    )
    ctx = ValidationContext(lookups={"lu_fmt": lu})
    res = ValidationRunner(suite, ctx, row_id_col="image_id").run(cleaned)

    got = {(r["row_id"], r["check_name"]) for r in res.violations.collect()}
    assert got == {
        ("i2", "notnull_caption"),
        ("i3", "maxlength_caption"),
        ("i4", "inlookup_fmt_lu_fmt"),
    }
    # every partition had a core error → the custom tier ran nowhere
    verd = {r["part_id"]: r["status"] for r in res.verdicts.collect()}
    assert verd == {0: "fail", 1: "fail"}
    # messages aggregate per row (reference generic.py:25-51 semantics)
    msgs = {r["row_id"]: r["error_message"] for r in res.messages_per_row().collect()}
    assert "empty value" in msgs["i2"]


def test_round2_production_cycle(spark, tmp_path):
    """The round-2 production loop end-to-end on one fixture:

    1. validate increment A with per-partition metrics + HLL sketches,
       checkpointed in waves;
    2. quarantine-split: bad rows aside, clean remainder appended to the
       partitioned production table;
    3. increment B arrives (one partition changed, one added): snapshot
       diff scopes revalidation to exactly the stale partitions;
    4. sketch-based NDV drift between the two increments' stored sketch
       rows flags the column whose value universe exploded — without
       rescanning either increment.
    """
    from smcchecker_spark import fixtures, stats
    from smcchecker_spark.checkpoint import CheckpointStore, run_with_checkpoint
    from smcchecker_spark.constraints import NotNull, Suite
    from smcchecker_spark.run import (
        ValidationRunner, quarantine_append, split_by_verdict,
    )
    from smcchecker_spark.tables import (
        ParquetTable, snapshot_diff, stale_partitions, scope_to_partitions,
    )
    from pyspark.sql import functions as F

    suite = Suite("img", "images", [NotNull("caption")])
    inc_a = fixtures.generate_images(spark, n_rows=240, n_parts=4, seed=1)

    # 1. checkpointed validation with sketch lineage
    store = CheckpointStore(str(tmp_path / "ckpt"))
    runner = ValidationRunner(
        suite, row_id_col="image_id", run_id="rA",
        metrics_columns=["fmt", "caption"], metrics_sketches=True,
    )
    run_with_checkpoint(runner, inc_a, store, partitions_per_wave=2)
    sk_a = store.sketches(spark, "rA")
    assert sk_a.count() == 8  # 4 parts x 2 columns

    # 2. quarantine split into the production table
    res = runner.run(inc_a)
    prod = ParquetTable(str(tmp_path / "prod"), partition_by=["part_id"])
    quar = ParquetTable(str(tmp_path / "quar"))
    n_clean, n_bad = quarantine_append(
        res, inc_a, "image_id", prod, quar
    )
    assert n_clean + n_bad == 240 and n_bad > 0
    clean, _ = split_by_verdict(res, inc_a, "image_id")
    assert prod.read(spark).count() == n_clean

    # 3. increment B: part 1's captions mutate, part 4 is new
    inc_b = fixtures.generate_images(spark, n_rows=240, n_parts=4, seed=1)
    inc_b = inc_b.withColumn(
        "caption",
        F.when(
            F.col("part_id") == 1, F.concat(F.col("caption"), F.lit("!"))
        ).otherwise(F.col("caption")),
    ).unionByName(
        fixtures.generate_images(spark, n_rows=60, n_parts=1, seed=2)
        .withColumn("part_id", F.lit(4))
    )
    diff = snapshot_diff(inc_b, inc_a, "part_id")
    stale = stale_partitions(diff)
    assert stale == {1, 4}
    scoped = scope_to_partitions(inc_b, stale, "part_id")
    assert set(
        r["part_id"] for r in scoped.select("part_id").distinct().collect()
    ) == {1, 4}
    # revalidate ONLY the stale slice (full_scope = the whole increment)
    res_b = ValidationRunner(suite, row_id_col="image_id", run_id="rB").run(
        scoped, full_scope=inc_b
    )
    assert res_b.verdicts.count() == 2

    # 4. sketch drift: plant an NDV explosion in B's fmt column, sketch
    # both increments, and flag it from the stored sketch rows alone
    exploded = inc_b.withColumn(
        "fmt",
        F.concat(
            F.lit("fmt_"),
            F.pmod(F.xxhash64("image_id"), F.lit(97)).cast("string"),
        ),
    )
    sk_b = stats.partition_hll_sketches(exploded, "part_id", ["fmt", "caption"])
    # caption gains ~0.5x new values too (mutated part 1 + the new part
    # 4) — a 2x threshold separates the planted 24x fmt explosion from it
    v, drift = stats.sketch_drift_violations(
        sk_b, sk_a.select("column", "hll_sketch"),
        max_new_ratio=2.0, table="images",
    )
    flagged = {r["columns"] for r in v.collect()}
    assert flagged == {"fmt"}
