"""Resume tests (SURVEY.md §5 item 4): kill after k waves; rerun; assert
only incomplete partitions re-process and the final violation set is
identical to an uninterrupted run."""

import pytest
from pyspark.sql import functions as F

from smcchecker_spark import fixtures
from smcchecker_spark.checkpoint import CheckpointStore, run_with_checkpoint
from smcchecker_spark.constraints import MaxLength, NotNull, Suite
from smcchecker_spark.run import ValidationRunner


@pytest.fixture()
def images(spark):
    return fixtures.generate_images(spark, n_rows=300, n_parts=6, seed=42).cache()


def _suite():
    return Suite(
        name="img",
        table="images",
        constraints=[NotNull("caption"), MaxLength("caption", max_length=256)],
    )


def test_resume_after_crash(spark, images, tmp_path):
    store = CheckpointStore(str(tmp_path / "ckpt"))

    # uninterrupted reference run
    ref_store = CheckpointStore(str(tmp_path / "ref"))
    runner = ValidationRunner(_suite(), run_id="ref")
    run_with_checkpoint(runner, images, ref_store, partitions_per_wave=6)
    ref_v = {
        (r["row_id"], r["check_name"])
        for r in ref_store.violations(spark, "ref").collect()
    }

    # crash after 1 wave of 2 partitions
    runner2 = ValidationRunner(_suite(), run_id="r1")
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_with_checkpoint(
            runner2, images, store, partitions_per_wave=2, fail_after_waves=1
        )
    done_after_crash = store.completed_partitions(spark, "r1")
    assert len(done_after_crash) == 2

    # resume: only the remaining 4 partitions run
    processed = run_with_checkpoint(runner2, images, store, partitions_per_wave=2)
    assert processed == set(range(6)) - done_after_crash

    # final state identical to the uninterrupted run
    got_v = {
        (r["row_id"], r["check_name"])
        for r in store.violations(spark, "r1").collect()
    }
    assert got_v == ref_v
    assert store.completed_partitions(spark, "r1") == set(range(6))

    # verdict metrics: per-partition row counts survive the crash/resume
    vd = store.verdicts(spark, "r1")
    assert vd.agg(F.sum("n_rows")).collect()[0][0] == 300


def test_crash_between_violation_and_verdict_writes(spark, images, tmp_path):
    """Regression: a crash AFTER the violations write but BEFORE the
    verdict (commit-marker) write leaves an orphaned wave directory; the
    resume must delete it, or the re-run of those partitions would leave
    their violations present twice."""
    store = CheckpointStore(str(tmp_path / "ckpt3"))
    runner = ValidationRunner(_suite(), run_id="r3")

    # wave 0 committed normally (partitions 0-1)
    parts01 = images.filter(F.col("part_id") < 2)
    res = runner.run(parts01)
    store.write_wave("r3", 0, res)
    # wave 1: violations land, verdicts don't (the crash window)
    parts23 = images.filter(F.col("part_id").isin([2, 3]))
    res2 = runner.run(parts23)
    with pytest.raises(RuntimeError, match="simulated crash between"):
        store.write_wave("r3", 1, res2, fail_before_commit=True)
    assert store.completed_partitions(spark, "r3") == {0, 1}
    assert 1 in store.wave_dirs("r3")  # the orphan exists

    # resume the full run: orphan removed, partitions 2-5 re-run cleanly
    processed = run_with_checkpoint(runner, images, store, partitions_per_wave=2)
    assert processed == {2, 3, 4, 5}
    v = store.violations(spark, "r3")
    # no duplicate violation rows: each (row_id, check) appears once
    assert v.count() == v.select("row_id", "check_name").distinct().count()
    # and the total matches an uninterrupted run
    ref_store = CheckpointStore(str(tmp_path / "ref3"))
    run_with_checkpoint(ValidationRunner(_suite(), run_id="ref"), images, ref_store)
    assert v.count() == ref_store.violations(spark, "ref").count()


def test_resume_noop_when_complete(spark, images, tmp_path):
    store = CheckpointStore(str(tmp_path / "ckpt2"))
    runner = ValidationRunner(_suite(), run_id="r2")
    run_with_checkpoint(runner, images, store)
    assert run_with_checkpoint(runner, images, store) == set()


def test_partition_metrics_checkpointed(spark, images, tmp_path):
    """metrics_columns: per-(partition, column) stats rows ride the same
    wave-commit protocol — emitted by the runner, written before the
    verdict marker, orphan-cleaned, and readable as the run's baseline
    snapshot after a crash+resume."""
    store = CheckpointStore(str(tmp_path / "ckpt_m"))
    runner = ValidationRunner(
        _suite(), run_id="rm", metrics_columns=["caption", "w", "fmt"]
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_with_checkpoint(
            runner, images, store, partitions_per_wave=2, fail_after_waves=1
        )
    run_with_checkpoint(runner, images, store, partitions_per_wave=2)

    m = store.metrics(spark, "rm")
    rows = {(r["part_id"], r["column"]): r for r in m.collect()}
    assert set(rows) == {(p, c) for p in range(6) for c in ("caption", "w", "fmt")}
    # n_rows per partition matches the verdicts' lineage counts
    vd = {r["part_id"]: r["n_rows"] for r in store.verdicts(spark, "rm").collect()}
    for (p, _), r in rows.items():
        assert r["n_rows"] == vd[p] and r["run_id"] == "rm"
    # sanity on the stats content: w is numeric with quantiles, null rate
    # reflects the fixture's planted NULL captions somewhere
    w0 = rows[(0, "w")]
    assert float(w0["min"]) >= 1 and w0["quantiles"] is not None
    assert any(rows[(p, "caption")]["null_count"] > 0 for p in range(6))


def test_resume_scan_partition_pruned(spark, images, tmp_path):
    """SURVEY §4.5 / VERDICT r1 item 3: resume on a PARTITIONED source
    must prune completed partitions at the scan. The source is a
    hive-partitioned ParquetTable (the in-sandbox Iceberg stand-in —
    same observable PartitionFilters behavior as a manifest prune):
    after a crash leaves 2 partitions committed, the resume predicate's
    plan shows partition filters and the executed scan touches only the
    4 unfinished partition directories."""
    import re

    from smcchecker_spark.tables import ParquetTable, resume_filter

    src = ParquetTable(str(tmp_path / "src"), partition_by=["part_id"])
    src.overwrite(images)
    df = src.read(spark)

    store = CheckpointStore(str(tmp_path / "ckpt_p"))
    runner = ValidationRunner(_suite(), run_id="rp")
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_with_checkpoint(
            runner, df, store, partitions_per_wave=2, fail_after_waves=1
        )
    done = store.completed_partitions(spark, "rp")
    assert len(done) == 2

    pruned = resume_filter(df, done, "part_id")
    plan = pruned.select("image_id")._jdf.queryExecution().explainString(
        pruned._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert re.search(r"PartitionFilters: \[.*part_id.*\]", plan), plan
    files = {
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert files and not any(f"part_id={p}/" in f for p in done for f in files)

    # and the resumed run processes exactly the unfinished partitions
    processed = run_with_checkpoint(runner, df, store, partitions_per_wave=2)
    assert processed == set(range(6)) - done
    assert store.completed_partitions(spark, "rp") == set(range(6))


def test_iceberg_seam_fails_fast_without_catalog(spark, images, tmp_path):
    """The IcebergTable adapter carries the production call shapes but
    must fail at PLAN time with an actionable message when the runtime/
    catalog is absent (this sandbox), not a deep ClassNotFound later."""
    from smcchecker_spark.run import gated_append
    from smcchecker_spark.tables import IcebergTable, as_table

    tbl = IcebergTable("lake.db.images")
    with pytest.raises(RuntimeError, match="spark.sql.catalog.lake"):
        tbl.read(spark)
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        tbl.append(images)
    # gated_append routes Table adapters through the seam
    res = ValidationRunner(_suite(), run_id="ri").run(
        images.filter(F.col("part_id") == 0)
    )
    if res.errs.limit(1).count() == 0:
        with pytest.raises(RuntimeError, match="catalog"):
            gated_append(res, images, tbl)
    assert as_table("x/y").path == "x/y"


def test_orphan_metrics_cleaned(spark, images, tmp_path):
    store = CheckpointStore(str(tmp_path / "ckpt_m2"))
    runner = ValidationRunner(_suite(), run_id="rm2", metrics_columns=["w"])
    res = runner.run(images.filter(F.col("part_id") < 2))
    with pytest.raises(RuntimeError, match="simulated crash between"):
        store.write_wave("rm2", 0, res, fail_before_commit=True)
    import os
    assert os.path.isdir(store._metrics_path("rm2", 0))
    store.cleanup_orphan_waves(spark, "rm2")
    assert not os.path.isdir(store._metrics_path("rm2", 0))


def test_null_part_id_rows_not_silently_skipped(spark, images, tmp_path):
    """Regression (review): rows with NULL part_id failed ~isin(done) on
    resume and silently vanished from every wave — the run finished
    "clean" with unvalidated rows. resume_filter must keep NULL-part
    rows in the todo set, and run_with_checkpoint must refuse them
    loudly."""
    from smcchecker_spark.tables import resume_filter

    with_null = images.withColumn(
        "part_id",
        F.when(F.col("part_id") == 5, F.lit(None).cast("int")).otherwise(
            F.col("part_id")
        ),
    )
    kept = resume_filter(with_null, done_parts={0, 1}).select("part_id")
    assert any(r["part_id"] is None for r in kept.collect())

    store = CheckpointStore(str(tmp_path / "ckpt_null"))
    runner = ValidationRunner(_suite(), run_id="rnull")
    with pytest.raises(ValueError, match="NULL 'part_id'"):
        run_with_checkpoint(runner, with_null, store, partitions_per_wave=2)


def test_unique_scopes_to_full_table_across_waves(spark, tmp_path):
    """Regression (500k soak): a duplicate key pair whose members land in
    DIFFERENT checkpoint waves must still be flagged — per-wave Unique
    aggregation silently missed cross-wave dup pairs."""
    from smcchecker_spark.constraints import Unique

    rows = [(f"id{i:03d}", i % 4, f"c{i}") for i in range(40)]
    rows.append(("id001", 3, "dup-in-far-partition"))  # id001 is in part 1
    df = spark.createDataFrame(rows, "image_id string, part_id int, caption string")
    suite = Suite("u", "images", [Unique(["image_id"])])

    # waves of ONE partition → the dup pair spans waves by construction
    store = CheckpointStore(str(tmp_path / "ckpt_xwave"))
    runner = ValidationRunner(suite, run_id="xw")
    run_with_checkpoint(runner, df, store, partitions_per_wave=1)
    flagged = {
        (r["row_id"], r["part_id"])
        for r in store.violations(spark, "xw").collect()
    }
    # both members of the pair flagged, each in its own partition's wave
    assert flagged == {("id001", 1), ("id001", 3)}


def test_intrange_parse_gate_scopes_to_full_table_across_waves(spark, tmp_path):
    """The whole-column parse gate (reference: metadata.py:237-245) is a
    FULL-TABLE decision: a wave whose slice happens to parse cleanly must
    not run the int-range check when another wave holds an unparseable
    value."""
    from smcchecker_spark.constraints import IntRange

    rows = [("a", 0, "99999999999"), ("b", 1, "5"), ("c", 1, "oops")]
    df = spark.createDataFrame(rows, "image_id string, part_id int, v string")
    suite = Suite("g", "t", [IntRange("v", width="int2")])

    # single-wave run: the 'oops' value trips the gate → no violations
    store = CheckpointStore(str(tmp_path / "ckpt_gate1"))
    run_with_checkpoint(
        ValidationRunner(suite, run_id="g1"), df, store, partitions_per_wave=2
    )
    assert store.violations(spark, "g1").count() == 0

    # one-partition waves: partition 0 alone parses cleanly, but the gate
    # must still see partition 1's 'oops' and suppress the check
    store2 = CheckpointStore(str(tmp_path / "ckpt_gate2"))
    run_with_checkpoint(
        ValidationRunner(suite, run_id="g2"), df, store2, partitions_per_wave=1
    )
    assert store2.violations(spark, "g2").count() == 0


def test_custom_tier_scope_parity_direct_vs_waves(spark, tmp_path):
    """A direct run and a checkpointed run of the SAME data must emit the
    same custom-tier violations. Two scope traps:

    - whole-column gate: the unparseable value lives in a partition that
      FAILS core — the gate is a full-table decision, so the custom-tier
      IntRange must be suppressed in both modes (pre-fix the direct run
      evaluated the gate over the core-passing subset only and ran it);
    - custom-tier Unique: the dup partner lives in the core-failed
      partition — the passing member must still be flagged in both modes.
    """
    from smcchecker_spark.constraints import IntRange, NotNull, Unique

    rows = [
        # part 0: passes core, parseable v, key k1
        ("a", 0, "ok", "5", "k1"),
        # part 1: core NotNull error + unparseable v + dup partner of k1
        ("b", 1, None, "oops", "k1"),
        ("c", 0, "ok", "7", "k2"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, part_id int, cap string, v string, k string"
    )
    suite = Suite(
        "parity", "t", [NotNull("cap")],
        custom_constraints=[
            IntRange("v", width="int2", is_core=False),
            Unique(["k"], is_core=False),
        ],
    )

    def custom_rows(violations):
        return {
            (r["row_id"], r["check_name"])
            for r in violations.collect()
            if r["check_name"] != "notnull_cap"
        }

    direct = ValidationRunner(suite, run_id="d").run(df)
    store = CheckpointStore(str(tmp_path / "ckpt_parity"))
    run_with_checkpoint(
        ValidationRunner(suite, run_id="w"), df, store, partitions_per_wave=1
    )
    waved = custom_rows(store.violations(spark, "w"))
    assert custom_rows(direct.violations) == waved
    # and the shared expectation: gate suppressed IntRange everywhere;
    # Unique flags the core-passing member 'a' (its partner 'b' sits in
    # the core-failed partition, which never reaches the custom tier)
    assert waved == {("a", "unique_k")}


def test_wave_loop_evaluates_full_scope_aggregates_once(spark, tmp_path, monkeypatch):
    """Whole-column gates are a function of the full scope — a K-wave run
    must evaluate them once per tier, not once per wave."""
    from smcchecker_spark import compile as compile_mod
    from smcchecker_spark.constraints import IntRange

    calls = {"n": 0}
    real = compile_mod.evaluate_preconditions

    def counting(df, constraints):
        calls["n"] += 1
        return real(df, constraints)

    monkeypatch.setattr(compile_mod, "evaluate_preconditions", counting)

    rows = [(f"i{i}", i % 4, str(i)) for i in range(16)]
    df = spark.createDataFrame(rows, "image_id string, part_id int, v string")
    suite = Suite("g", "t", [IntRange("v", width="int2")])
    store = CheckpointStore(str(tmp_path / "ckpt_once"))
    run_with_checkpoint(
        ValidationRunner(suite, run_id="once"), df, store, partitions_per_wave=1
    )
    # 4 one-partition waves, ONE gate evaluation (core tier only)
    assert calls["n"] == 1
    assert store.violations(spark, "once").count() == 0


def test_snapshot_diff_statuses(spark):
    """Partition-level content diff: added / removed / changed /
    unchanged, decided without ever shuffling data rows."""
    from smcchecker_spark.tables import snapshot_diff, stale_partitions

    base = spark.createDataFrame(
        [(i, i % 4, f"v{i}") for i in range(40)],
        "id long, part_id int, payload string",
    )
    cur = (
        base.filter(~((F.col("part_id") == 1) & (F.col("id") == 5)))  # changed
        .withColumn(
            "payload",
            F.when(F.col("part_id") == 2, F.concat("payload", F.lit("!")))
            .otherwise(F.col("payload")),                             # changed
        )
        .filter(F.col("part_id") != 3)                                # removed
        .unionByName(
            base.filter(F.col("part_id") == 0).withColumn(
                "part_id", F.lit(9)
            )                                                         # added
        )
    )
    got = {r["part"]: r["status"] for r in snapshot_diff(cur, base, "part_id").collect()}
    assert got == {0: "unchanged", 1: "changed", 2: "changed",
                   3: "removed", 9: "added"}
    assert stale_partitions(snapshot_diff(cur, base, "part_id")) == {1, 2, 9}


def test_snapshot_diff_order_and_dup_insensitivity(spark):
    """The fingerprint must ignore row order / partition layout, and the
    xor-cancellation trap (a row added TWICE xors back to the baseline
    hash) must be caught by the count/sum backups."""
    from smcchecker_spark.tables import snapshot_diff

    base = spark.createDataFrame(
        [(i, 0, "x") for i in range(10)], "id long, part_id int, p string"
    )
    shuffled = base.orderBy(F.rand(7)).repartition(7)
    got = snapshot_diff(shuffled, base, "part_id").collect()
    assert [(r["part"], r["status"]) for r in got] == [(0, "unchanged")]

    dup_twice = base.unionByName(
        spark.createDataFrame([(3, 0, "x"), (3, 0, "x")],
                              "id long, part_id int, p string")
    )
    got2 = snapshot_diff(dup_twice, base, "part_id").collect()
    assert [(r["part"], r["status"]) for r in got2] == [(0, "changed")]


def test_scope_to_partitions_prunes_at_source(spark, images, tmp_path):
    """Incremental revalidation reads ONLY stale partitions: the isin
    predicate on the partition column becomes PartitionFilters on a
    hive-partitioned source (the Iceberg stand-in)."""
    import re

    from smcchecker_spark.tables import ParquetTable, scope_to_partitions

    src = ParquetTable(str(tmp_path / "inc_src"), partition_by=["part_id"])
    src.overwrite(images)
    df = src.read(spark)
    scoped = scope_to_partitions(df, {1, 4}, "part_id")
    plan = scoped.select("image_id")._jdf.queryExecution().explainString(
        scoped._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert re.search(r"PartitionFilters: \[.*part_id.*\]", plan), plan
    files = {
        r[0] for r in scoped.select(F.input_file_name()).distinct().collect()
    }
    assert files and all(
        f"part_id={p}/" in f for f in files for p in [1, 4]
        if f"part_id={p}/" in f
    )
    assert {r[0] for r in scoped.select("part_id").distinct().collect()} == {1, 4}
    # empty stale set = zero work
    assert scope_to_partitions(df, set(), "part_id").count() == 0


def test_sketches_checkpointed_and_mergeable(spark, images, tmp_path):
    """metrics_sketches=True: per-(partition, column) HLL sketch rows
    ride the wave-commit protocol, survive a crash+resume, and the
    stored rows alone answer the global-NDV question within the
    sketch's rsd — no rescan of the validated table."""
    from smcchecker_spark import stats

    store = CheckpointStore(str(tmp_path / "ckpt_sk"))
    runner = ValidationRunner(
        _suite(), run_id="rs",
        metrics_columns=["fmt", "caption"], metrics_sketches=True,
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_with_checkpoint(
            runner, images, store, partitions_per_wave=2, fail_after_waves=1
        )
    run_with_checkpoint(runner, images, store, partitions_per_wave=2)

    sk = store.sketches(spark, "rs")
    assert {(r["part_id"], r["column"]) for r in sk.select(
        "part_id", "column").collect()} == {
        (p, c) for p in range(6) for c in ("fmt", "caption")
    }
    merged = {r["column"]: r["ndv_est"]
              for r in stats.merged_ndv(sk).collect()}
    exact = images.agg(
        F.count_distinct(F.col("fmt").cast("string")).alias("fmt"),
        F.count_distinct(F.col("caption").cast("string")).alias("caption"),
    ).collect()[0]
    for c in ("fmt", "caption"):
        assert abs(merged[c] - exact[c]) <= max(1, 0.05 * exact[c]), (
            c, merged[c], exact[c],
        )
