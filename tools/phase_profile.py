"""Phase-level wall breakdown of one suite run at one parallelism level.

Splits the end-to-end suite wall (the number the scaling gate divides) into
its serial phases so the NON-SCALING share is measured, not guessed:

    build     — validate_table DAG construction up to the scratch write
                (pure driver/py4j + catalyst analysis; cannot scale)
    scratch   — the fused-projection parquet write (distributed)
    rest      — remaining DAG construction after the scratch barrier (driver)
    sinks     — the three concurrent noop writes (distributed)
    cleanup   — unpersist + clearCache (driver)

    python tools/phase_profile.py --cores 32 [--n-images 32000000]

Prints one JSON line. Compare --cores 8 vs 32: phases whose time is flat
across levels are the fixed overhead that caps suite scaling efficiency
(BENCH/BASELINE.md analysis).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--n-images", type=int, default=32000000)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--data", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata"))
    ap.add_argument("--eventlog", default=None,
                    help="directory for Spark event logs (feed to "
                         "tools/driver_gap.py for zero-tasks-running share)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from jsonschema_spark import fixtures as FX
    from jsonschema_spark.engine import recommended_conf, validate_table

    b = (SparkSession.builder.appName("phase-profile")
         .master(f"local[{args.cores}]")
         .config("spark.driver.memory", "48g")
         .config("spark.local.dir", "/dev/shm/spark-scratch")
         .config("spark.driver.extraJavaOptions",
                 f"-XX:+UseParallelGC -XX:ActiveProcessorCount={args.cores}")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false"))
    if args.eventlog:
        os.makedirs(args.eventlog, exist_ok=True)
        b = (b.config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.dir", args.eventlog)
             .config("spark.eventLog.compress", "false"))
    for k, v in recommended_conf(args.cores).items():
        b = b.config(k, v)
    b = b.config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    n = args.n_images
    table_dir = os.path.join(args.data, f"images_{n}")
    base_dir = os.path.join(args.data, f"baseline_{n}")
    fact = spark.read.parquet(table_dir)
    baseline = spark.read.parquet(base_dir)
    cfg = FX.FixtureConfig(n=n, n_parts=256, with_bytes=False)
    dims = {"dim_fmt": FX.dim_fmt_df(spark),
            "dim_license": FX.dim_license_df(spark, cfg)}
    scratch = "/dev/shm/spark-scratch/fuse-base"

    def one_run() -> dict:
        from concurrent.futures import ThreadPoolExecutor
        import shutil

        shutil.rmtree(scratch, ignore_errors=True)
        t0 = time.time()
        res = validate_table(fact, FX.SPEC_IMAGES, dims=dims, baseline=baseline,
                             drift_columns=FX.drift_columns(),
                             fuse_scratch=scratch)
        t1 = time.time()   # build (incl. the eager scratch write)
        with ThreadPoolExecutor(3) as ex:
            list(ex.map(
                lambda df: df.write.format("noop").mode("overwrite").save(),
                (res.violations, res.verdicts, res.stats),
            ))
        t2 = time.time()
        res.cleanup()
        spark.catalog.clearCache()
        t3 = time.time()
        return {"build_and_scratch": round(t1 - t0, 2),
                "sinks": round(t2 - t1, 2),
                "cleanup": round(t3 - t2, 2),
                "total": round(t3 - t0, 2)}

    one_run()  # warm-up, discarded
    out = [one_run() for _ in range(args.runs)]
    print(json.dumps({"cores": args.cores, "n_images": n, "phases": out}))


if __name__ == "__main__":
    main()
