"""One-off bench point at an arbitrary scale factor.

Usage:
    python tools/bench_sf_point.py SF_DIR [N_IMAGES] [CPUS]

Runs the headline query suite from bench.py against SF_DIR (best-of-2
per query) plus the full-constraint image-validation throughput over an
N_IMAGES corpus, and prints one JSON line. Used for the sf1 curve point
(BENCH.md): the per-round driver bench stays at sf0.1 for series
comparability; this script answers "does the throughput curve hold at
10x the rows?".

Generate the scaled tables first:
    python tools/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    os.environ["BENCH_IMAGES"] = str(n_images)

    import bench
    import __spark_entry__ as entry_mod

    bench._prepare_images(min(32, os.cpu_count() or 8))  # prep ≠ measure
    spark = bench._get_spark(cpus)
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in bench.HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            bench._materialize(df)
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)

    suite, fixtures = bench._image_suite()
    from smcchecker_spark.compile import compile_suite
    from smcchecker_spark.constraints import ValidationContext

    df = spark.read.parquet(bench.IMG_DIR)
    lu = fixtures.lu_fmt(spark)
    ctx = ValidationContext(lookups={"lu_fmt": lu})
    warm = compile_suite(
        df.sample(0.02, seed=1), suite, ctx,
        row_id_col="image_id", part_id_col="part_id",
    )
    bench._materialize(warm)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        bench._materialize(compile_suite(
            df, suite, ctx, row_id_col="image_id", part_id_col="part_id"
        ))
        best = min(best, time.time() - t0)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "sf-point: headline query seconds + images/sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "images_per_sec": round(n_images / best, 1),
        "n_images": n_images,
        "cpus": cpus,
    }
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
