"""scripts/run_validation.py — suite-config parsing + end-to-end run
through main() (the spark-submit entry point; the actual spark-submit
--py-files invocation is exercised manually / in BENCH notes)."""

import json
import sys

import pytest

sys.path.insert(0, "scripts")

from run_validation import build_constraint, load_suite, main  # noqa: E402

from smcchecker_spark import fixtures  # noqa: E402


def test_build_constraint_all_types():
    specs = [
        {"type": "not_null", "column": "a"},
        {"type": "dtype", "column": "a", "dtype": "int"},
        {"type": "max_length", "column": "a", "max_length": 5},
        {"type": "precision", "column": "a", "precision": 4},
        {"type": "scale", "column": "a", "scale": 2},
        {"type": "int_range", "column": "a", "width": "int2"},
        {"type": "range", "column": "a", "lo": 0, "hi": 9},
        {"type": "regex", "column": "a", "pattern": "^x"},
        {"type": "field_equals", "column": "a", "reference_col": "b"},
        {"type": "unique", "keys": ["a", "b"]},
        {"type": "in_lookup", "column": "a", "lookup": "lu", "lookup_key": "k"},
        {"type": "not_in_existing", "keys": ["a"], "existing": "prod"},
        {"type": "subset_of", "keys": ["a"], "other": "t"},
        {"type": "image_consistent"},
        {"type": "min_resolution", "column": "w", "h_col": "h", "min_w": 32, "min_h": 32},
        {"type": "aspect_ratio_range", "column": "w", "h_col": "h", "lo": 0.5, "hi": 2.0},
        {"type": "bytes_per_pixel_range", "column": "bytes", "lo": 0.1, "hi": 10.0},
        {"type": "vector_shape", "column": "emb", "dim": 64},
        {"type": "vector_finite", "column": "emb"},
        {"type": "vector_norm_range", "column": "emb", "lo": 0.5, "hi": 2.0},
        {"type": "only_when", "condition": "fmt = 'jpeg'",
         "check": {"type": "not_null", "column": "quality"}},
        {"type": "monotonic_within", "column": "v", "keys": ["user"],
         "order_by": "seq", "strict": True},
    ]
    names = [build_constraint(s).name for s in specs]
    assert len(names) == len(set(names)) == len(specs)
    # nested spec round-trips the inner constraint's semantics
    ow = build_constraint(specs[-2])
    assert ow.name == "when_notnull_quality" and ow.condition == "fmt = 'jpeg'"
    with pytest.raises(SystemExit):
        build_constraint({"type": "nope", "column": "a"})


def test_cli_end_to_end(spark, tmp_path):
    df = fixtures.generate_images(spark, n_rows=200, n_parts=4, seed=42)
    df.write.parquet(str(tmp_path / "in"))
    fixtures.lu_fmt(spark).write.parquet(str(tmp_path / "lu"))
    cfg = {
        "name": "images_core",
        "table": "images",
        "row_id_col": "image_id",
        "part_id_col": "part_id",
        "constraints": [
            {"type": "not_null", "column": "caption"},
            {"type": "unique", "keys": ["image_id"]},
            {"type": "in_lookup", "column": "fmt", "lookup": "lu_fmt",
             "lookup_key": "fmt"},
        ],
    }
    (tmp_path / "suite.json").write_text(json.dumps(cfg))
    rc = main([
        "--input", str(tmp_path / "in"),
        "--suite", str(tmp_path / "suite.json"),
        "--out", str(tmp_path / "out"),
        "--lookup", f"lu_fmt={tmp_path / 'lu'}",
    ])
    assert rc == 1  # planted violations → nonzero exit
    v = spark.read.parquet(str(tmp_path / "out" / "violations"))
    assert v.count() > 0
    verd = spark.read.parquet(str(tmp_path / "out" / "verdicts"))
    assert verd.count() == 4


def test_cli_gated_append(spark, tmp_path):
    """--gated-append mirrors the reference's /load gate: refuse on any
    error, all-or-nothing append on a clean run (proj/load.py:23-24)."""
    dirty = fixtures.generate_images(spark, n_rows=80, n_parts=2, seed=3)
    dirty.write.parquet(str(tmp_path / "dirty"))
    clean = fixtures.generate_images(
        spark, n_rows=80, n_parts=2, seed=3, clean=True)
    clean.write.parquet(str(tmp_path / "clean"))
    cfg = {
        "name": "s", "table": "images",
        "row_id_col": "image_id", "part_id_col": "part_id",
        "constraints": [{"type": "not_null", "column": "caption"}],
    }
    (tmp_path / "suite.json").write_text(json.dumps(cfg))
    dest = tmp_path / "prod"

    def run(src):
        return main([
            "--input", str(tmp_path / src),
            "--suite", str(tmp_path / "suite.json"),
            "--out", str(tmp_path / "out"),
            "--gated-append", str(dest),
        ])

    assert run("dirty") == 1
    assert not dest.exists()  # refused: nothing written
    assert run("clean") == 0
    assert spark.read.parquet(str(dest)).count() == 80


def test_cli_gated_append_expectations(spark, tmp_path):
    """An `expectations` block in the suite config gates the load on
    table-level bounds too: a row-clean input that misses the row-count
    floor is refused; loosening the floor loads it."""
    clean = fixtures.generate_images(
        spark, n_rows=80, n_parts=2, seed=3, clean=True)
    clean.write.parquet(str(tmp_path / "clean"))
    dest = tmp_path / "prod_exp"

    def run(floor):
        cfg = {
            "name": "s", "table": "images",
            "row_id_col": "image_id", "part_id_col": "part_id",
            "constraints": [{"type": "not_null", "column": "caption"}],
            "expectations": [{"metric": "row_count", "lo": floor}],
        }
        (tmp_path / "suite_exp.json").write_text(json.dumps(cfg))
        return main([
            "--input", str(tmp_path / "clean"),
            "--suite", str(tmp_path / "suite_exp.json"),
            "--out", str(tmp_path / "out_exp"),
            "--gated-append", str(dest),
        ])

    assert run(10_000) == 0  # row-clean: exit code reflects row errors
    assert not dest.exists()  # …but the expectation floor refused the load
    assert run(50) == 0
    assert spark.read.parquet(str(dest)).count() == 80


def test_cli_checkpoint_resume(spark, tmp_path):
    df = fixtures.generate_images(spark, n_rows=120, n_parts=4, seed=9)
    df.write.parquet(str(tmp_path / "in"))
    cfg = {
        "name": "s", "table": "images",
        "row_id_col": "image_id", "part_id_col": "part_id",
        "constraints": [{"type": "not_null", "column": "caption"}],
    }
    (tmp_path / "suite.json").write_text(json.dumps(cfg))
    args = [
        "--input", str(tmp_path / "in"),
        "--suite", str(tmp_path / "suite.json"),
        "--out", str(tmp_path / "out"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--run-id", "r1", "--waves", "2",
    ]
    main(args)
    # second run: everything checkpointed → no partitions re-processed
    from smcchecker_spark.checkpoint import CheckpointStore

    store = CheckpointStore(str(tmp_path / "ckpt"))
    assert store.completed_partitions(spark, "r1") == {0, 1, 2, 3}
    main(args)  # resume is a no-op, outputs still written from checkpoint
    v = spark.read.parquet(str(tmp_path / "out" / "violations"))
    assert v.select("row_id").distinct().count() == v.count()  # no dup appends


def test_cli_suggest_roundtrip(spark, tmp_path, sf_dir):
    """--suggest profiles the input into a suite config + lookup parquet
    sidecars; validating the same input with that config passes clean
    (the snapshot passes its own suggested suite)."""
    dest = tmp_path / "auto_suite.json"
    rc = main([
        "--input", f"{sf_dir}/documents.parquet",
        "--suggest", str(dest),
        "--row-id", "doc_id",
    ])
    assert rc == 0
    cfg = json.loads(dest.read_text())
    kinds = {c["type"] for c in cfg["constraints"]}
    assert {"not_null", "unique", "range", "in_lookup"} <= kinds
    lu_args = [
        f"lu_{c}={tmp_path / ('lu_' + c + '.parquet')}"
        for c in ("lang", "source")
    ]
    for kv in lu_args:
        assert (tmp_path / kv.split("=")[1].rsplit("/", 1)[-1]).exists()
    rc = main([
        "--input", f"{sf_dir}/documents.parquet",
        "--suite", str(dest),
        "--out", str(tmp_path / "out"),
        *[a for kv in lu_args for a in ("--lookup", kv)],
    ])
    assert rc == 0  # clean input → zero violations → exit 0
    v = spark.read.parquet(str(tmp_path / "out" / "violations"))
    assert v.count() == 0


def test_cli_suggest_image_table(spark, tmp_path):
    """--suggest on an image-shaped input also derives the decode-free
    policy gates from the observed envelope; the snapshot validates
    clean against its own suggested config."""
    df = fixtures.generate_images(spark, n_rows=150, n_parts=4, seed=5,
                                  clean=True)
    df.write.parquet(str(tmp_path / "imgs"))
    dest = tmp_path / "img_suite.json"
    rc = main([
        "--input", str(tmp_path / "imgs"),
        "--suggest", str(dest),
        "--row-id", "image_id",
    ])
    assert rc == 0
    cfg = json.loads(dest.read_text())
    kinds = {c["type"] for c in cfg["constraints"]}
    assert {"min_resolution", "aspect_ratio_range",
            "bytes_per_pixel_range"} <= kinds
    lu = [
        a for c in cfg["constraints"] if c["type"] == "in_lookup"
        for a in ("--lookup",
                  f"{c['lookup']}={tmp_path / (c['lookup'] + '.parquet')}")
    ]
    rc = main([
        "--input", str(tmp_path / "imgs"),
        "--suite", str(dest),
        "--out", str(tmp_path / "out"),
        *lu,
    ])
    assert rc == 0
    assert spark.read.parquet(str(tmp_path / "out" / "violations")).count() == 0


def test_cli_audio_video_constraint_specs():
    """The JSON suite registry builds the new modality constraints with
    per-spec column overrides."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_validation", "scripts/run_validation.py"
    )
    rv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rv)
    from smcchecker_spark.audio import AudioConsistent
    from smcchecker_spark.video import VideoConsistent

    a = rv.build_constraint(
        {"type": "audio_consistent", "column": "wav", "rate_col": "hz"}
    )
    assert isinstance(a, AudioConsistent)
    assert a.column == "wav" and a.rate_col == "hz"
    v = rv.build_constraint({"type": "video_consistent"})
    assert isinstance(v, VideoConsistent) and v.column == "bytes"
