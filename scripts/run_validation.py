#!/usr/bin/env python
"""spark-submit entry point — the north rule's deployment surface:

    python -m smcchecker_spark.package  # or scripts/build_zip.py → zip
    spark-submit --py-files /tmp/smcchecker_spark-<hash>.zip \
        scripts/run_validation.py \
        --input  /data/images_table \
        --suite  configs/images_suite.json \
        --out    /data/validation_out \
        [--lookup lu_fmt=/data/lu_fmt.parquet ...] \
        [--checkpoint /data/validation_ckpt --run-id run42 --waves 8]

On a cluster the SparkSession comes from spark-submit (master/executors
set at submit time); locally it falls back to the engine's tuned local
session. The suite config is data (JSON), mirroring the reference's
datasets.json + information_schema metadata as a declarative spec.

Suite JSON shape::

    {"name": "images_core", "table": "images",
     "row_id_col": "image_id", "part_id_col": "part_id",
     "exclude_columns": [],
     "constraints": [
        {"type": "not_null", "column": "caption"},
        {"type": "max_length", "column": "caption", "max_length": 256},
        {"type": "unique", "keys": ["image_id"]},
        {"type": "in_lookup", "column": "fmt", "lookup": "lu_fmt",
         "lookup_key": "fmt"},
        {"type": "image_consistent"},
        {"type": "audio_consistent"},   # WAV payload columns
        {"type": "video_consistent"},   # AVI-MJPEG payload columns
        {"type": "range", "column": "w", "lo": 1, "hi": 65535},
        {"type": "regex", "column": "image_id", "pattern": "^img"},
        {"type": "dtype", "column": "w", "dtype": "int"},
        {"type": "int_range", "column": "h", "width": "int4"},
        {"type": "precision", "column": "x", "precision": 10},
        {"type": "scale", "column": "x", "scale": 3},
        {"type": "not_in_existing", "keys": ["image_id"],
         "existing": "prod"},
        {"type": "subset_of", "keys": ["fmt"], "other": "lu"}
     ],
     "custom_constraints": [...]}
"""

from __future__ import annotations

import argparse
import json
import sys


def build_constraint(spec: dict):
    from smcchecker_spark import constraints as C
    from smcchecker_spark.image import (
        AspectRatioRange,
        BytesPerPixelRange,
        ExifSane,
        ImageConsistent,
        MinResolution,
        PsnrAtLeast,
    )
    from smcchecker_spark.audio import AudioConsistent
    from smcchecker_spark.video import VideoConsistent
    from smcchecker_spark.vector import (
        VectorFinite,
        VectorNormRange,
        VectorShape,
    )

    kind = spec["type"]
    args = {k: v for k, v in spec.items() if k != "type"}
    factory = {
        "not_null": C.NotNull,
        "dtype": C.Dtype,
        "max_length": C.MaxLength,
        "precision": C.Precision,
        "scale": C.Scale,
        "int_range": C.IntRange,
        "range": C.Range,
        "regex": C.Regex,
        "field_equals": C.FieldEquals,
        "unique": C.Unique,
        "monotonic_within": C.MonotonicWithin,
        "robust_outliers": C.RobustOutliers,
        "in_lookup": C.InLookup,
        "not_in_existing": C.NotInExisting,
        "subset_of": C.SubsetOf,
        "image_consistent": ImageConsistent,
        "exif_sane": ExifSane,
        "audio_consistent": AudioConsistent,
        "video_consistent": VideoConsistent,
        "psnr_at_least": PsnrAtLeast,
        "min_resolution": MinResolution,
        "aspect_ratio_range": AspectRatioRange,
        "bytes_per_pixel_range": BytesPerPixelRange,
        "vector_shape": VectorShape,
        "vector_finite": VectorFinite,
        "vector_norm_range": VectorNormRange,
    }
    if kind == "only_when":
        # nested spec: {"type": "only_when", "condition": "<sql bool>",
        # "check": {...inner row-level constraint spec...}}
        return C.OnlyWhen(args.pop("condition"), build_constraint(args.pop("check")))
    if kind not in factory:
        raise SystemExit(f"unknown constraint type {kind!r}")
    if kind == "unique":
        return C.Unique(args.pop("keys"), **args)
    if kind == "not_in_existing":
        return C.NotInExisting(args.pop("keys"), args.pop("existing"), **args)
    if kind == "subset_of":
        return C.SubsetOf(args.pop("keys"), args.pop("other"), **args)
    if "column" in args:
        col = args.pop("column")
        return factory[kind](col, **args)
    return factory[kind](**args)


def load_expectations(path: str):
    """Optional ``"expectations": [{"metric": ..., "column": ...,
    "lo": ..., "hi": ..., "approx": ...}, ...]`` block in the suite
    config — table-level aggregate bounds gating the load alongside the
    row-level checks (stats.check_expectations)."""
    from smcchecker_spark.stats import Expectation

    cfg = json.load(open(path))
    return [Expectation(**spec) for spec in cfg.get("expectations", [])]


def load_suite(path: str):
    from smcchecker_spark.constraints import Suite

    cfg = json.load(open(path))
    return (
        Suite(
            name=cfg["name"],
            table=cfg.get("table", cfg["name"]),
            constraints=[build_constraint(c) for c in cfg["constraints"]],
            exclude_columns=tuple(cfg.get("exclude_columns", [])),
            custom_constraints=[
                build_constraint(c) for c in cfg.get("custom_constraints", [])
            ],
        ),
        cfg.get("row_id_col", "image_id"),
        cfg.get("part_id_col", "part_id"),
    )


def suggest_cmd(spark, args) -> int:
    """--suggest: profile the input into a candidate suite config
    (stats.suggest_suite) written as JSON, with the derived lookup sets
    as lu_<col>.parquet files beside it — review, then validate with
    --suite <json> --lookup lu_<col>=<path>."""
    import os

    from smcchecker_spark import stats

    df = spark.read.format(args.fmt).load(args.input)
    table = args.table or os.path.basename(args.input.rstrip("/")).split(".")[0]
    suite, ctx = stats.suggest_suite(df, name=f"{table}_auto", table=table)
    constraints = list(suite.constraints)

    # image-shaped input (the input_hint schema: w/h ints + binary
    # payload): also derive the decode-free policy gates from the
    # snapshot's observed envelope (image.suggest_image_policy)
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if (
        types.get("w", "").startswith("int")
        and types.get("h", "").startswith("int")
        and types.get("bytes") == "binary"
    ):
        from smcchecker_spark.image import suggest_image_policy

        constraints.extend(suggest_image_policy(df))

    spec_of = {
        "NotNull": lambda c: {"type": "not_null", "column": c.column},
        "Unique": lambda c: {"type": "unique", "keys": list(c.keys)},
        "Range": lambda c: {"type": "range", "column": c.column,
                            "lo": c.lo, "hi": c.hi},
        "InLookup": lambda c: {"type": "in_lookup", "column": c.column,
                               "lookup": c.lookup,
                               "lookup_key": c.lookup_key},
        "MinResolution": lambda c: {
            "type": "min_resolution", "column": c.column, "h_col": c.h_col,
            "min_w": c.min_w, "min_h": c.min_h},
        "AspectRatioRange": lambda c: {
            "type": "aspect_ratio_range", "column": c.column,
            "h_col": c.h_col, "lo": c.lo, "hi": c.hi},
        "BytesPerPixelRange": lambda c: {
            "type": "bytes_per_pixel_range", "column": c.column,
            "w_col": c.w_col, "h_col": c.h_col, "lo": c.lo, "hi": c.hi,
            "length_is_column": c.length_is_column},
    }
    cfg = {
        "name": suite.name,
        "table": suite.table,
        "row_id_col": args.row_id,
        "part_id_col": None,
        "constraints": [
            spec_of[type(c).__name__](c) for c in constraints
        ],
    }
    dest_dir = os.path.dirname(os.path.abspath(args.suggest)) or "."
    os.makedirs(dest_dir, exist_ok=True)
    lookup_args = []
    for name, lu_df in ctx.lookups.items():
        path = os.path.join(dest_dir, f"{name}.parquet")
        lu_df.write.mode("overwrite").parquet(path)
        lookup_args.append(f"--lookup {name}={path}")
    with open(args.suggest, "w") as f:
        json.dump(cfg, f, indent=2)
    print(f"wrote {args.suggest} ({len(cfg['constraints'])} constraints)")
    if lookup_args:
        print("validate with: " + " ".join(lookup_args))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="table path (parquet dir)")
    p.add_argument("--suite", help="suite config JSON")
    p.add_argument("--suggest", metavar="DEST.json",
                   help="profile --input into a candidate suite config "
                   "(+ lu_*.parquet lookup sets beside it) and exit")
    p.add_argument("--table", default=None,
                   help="table name for --suggest (default: input basename)")
    p.add_argument("--row-id", default="image_id",
                   help="row id column recorded in the suggested config")
    p.add_argument("--out", help="output dir (violations/, verdicts/)")
    p.add_argument("--lookup", action="append", default=[],
                   metavar="NAME=PATH", help="lookup table (repeatable)")
    p.add_argument("--existing", action="append", default=[],
                   metavar="NAME=PATH", help="existing-snapshot table (repeatable)")
    p.add_argument("--checkpoint", help="checkpoint root → resumable wave mode")
    p.add_argument("--run-id", default="run0")
    p.add_argument("--waves", type=int, default=None,
                   help="partitions per wave (checkpoint mode)")
    p.add_argument("--fmt", default="parquet", help="input format")
    p.add_argument(
        "--gated-append", default=None, metavar="DEST",
        help="on zero errors, append the validated input rows to DEST — "
        "the reference's /load gate (proj/load.py:23-24). Sink type is "
        "chosen by --dest-fmt, NOT by the input --fmt (validate staged "
        "parquet, load an Iceberg prod table).",
    )
    p.add_argument(
        "--dest-fmt", default="parquet", choices=["parquet", "iceberg"],
        help="sink format for --gated-append: parquet path or Iceberg "
        "catalog.db.table identifier",
    )
    args = p.parse_args(argv)
    if not args.suggest and (not args.suite or not args.out):
        p.error("--suite and --out are required (unless using --suggest)")

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from smcchecker_spark.session import get_spark

        spark = get_spark("run-validation")
    else:  # cluster session from spark-submit: still ship the package
        from smcchecker_spark.package import ensure_shipped

        ensure_shipped(spark)

    if args.suggest:
        return suggest_cmd(spark, args)

    from smcchecker_spark.constraints import ValidationContext
    from smcchecker_spark.run import ValidationRunner

    suite, row_id_col, part_id_col = load_suite(args.suite)
    def _read(path: str):
        # catalog-registered Iceberg tables are read as spark.table(id),
        # not .format("iceberg").load(path); other formats are path loads
        if args.fmt == "iceberg":
            from smcchecker_spark.tables import IcebergTable

            return IcebergTable(path).read(spark)
        return spark.read.format(args.fmt).load(path)

    ctx = ValidationContext(
        lookups={
            n: _read(path)
            for n, path in (kv.split("=", 1) for kv in args.lookup)
        },
        existing={
            n: _read(path)
            for n, path in (kv.split("=", 1) for kv in args.existing)
        },
    )
    df = _read(args.input)
    runner = ValidationRunner(
        suite, ctx, row_id_col=row_id_col, part_id_col=part_id_col,
        run_id=args.run_id,
    )

    if args.checkpoint:
        from smcchecker_spark.checkpoint import CheckpointStore, run_with_checkpoint

        store = CheckpointStore(args.checkpoint)
        done = run_with_checkpoint(runner, df, store,
                                   partitions_per_wave=args.waves)
        print(f"processed partitions this run: {sorted(done)}")
        violations = store.violations(spark, args.run_id)
        verdicts = store.verdicts(spark, args.run_id)
    else:
        result = runner.run(df)
        violations, verdicts = result.violations, result.verdicts

    violations.write.mode("overwrite").parquet(args.out + "/violations")
    verdicts.write.mode("overwrite").parquet(args.out + "/verdicts")
    n_err = violations.filter("severity = 'error'").count()
    n_warn = violations.filter("severity = 'warning'").count()
    statuses = {r["part_id"]: r["status"] for r in verdicts.collect()}
    print(f"errors={n_err} warnings={n_warn} partitions={statuses}")
    if args.gated_append:
        from smcchecker_spark.tables import sink_for

        sink = sink_for(args.gated_append, args.dest_fmt)
        bad_exp = []
        exps = load_expectations(args.suite)
        if n_err == 0 and exps:
            from smcchecker_spark.stats import check_expectations

            bad_exp = [
                f"{r['check']}={r['value']}"
                for r in check_expectations(df, exps).collect()
                if not r["ok"]
            ]
        if n_err == 0 and not bad_exp:
            sink.append(df)
            print(f"gated append: loaded -> {args.gated_append}")
        elif n_err:
            print(f"gated append: REFUSED ({n_err} errors)")
        else:
            print(f"gated append: REFUSED (expectations failed: {bad_exp})")
    return 0 if n_err == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
