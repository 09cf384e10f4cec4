"""Locate the level-independent (fixed) cost inside one suite run.

Motivation (round 4): with quiet-host suite times T8=96.5s / T32=60.67s and
a ~2.22x measured scan-ceiling, the Amdahl fit T = F + W/ceiling implies
~30s of per-run cost that does NOT shrink with cores — the scaling gate's
ratio is bounded by it. Candidates: driver-side Catalyst analysis + py4j
plan construction (the fused image spec compiles to a very wide
projection), driver collects between passes, JVM GC (stage-profile showed
gc fraction 0.15-0.2 at 32c vs 0.04 at 8c), and stage-scheduling gaps.

This tool phases ONE suite run and prints wall time per phase:
  construct  - validate_table() call itself (plan building + any internal
               jobs: the fused scratch write, profile collects)
  sinks      - the three concurrent noop sink writes
plus, with --eventlog, the summed stage wall vs run wall (the difference is
driver/scheduler time no executor ever saw).

Usage (quiet host only — this is a measurement):
    taskset -c 0-31 python tools/fixed_cost_profile.py --cores 32
    taskset -c 0-7  python tools/fixed_cost_profile.py --cores 8
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
    ap.add_argument("--n-images", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES",
                                               "32000000")))
    ap.add_argument("--data", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata"))
    ap.add_argument("--runs", type=int, default=2,
                    help="first run is the JIT warm-up; phases reported "
                         "for every run so warm-vs-cold is visible")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from jsonschema_spark import fixtures as FX
    from jsonschema_spark.engine import recommended_conf, validate_table

    b = (SparkSession.builder.appName("fixed-cost-profile")
         .master(f"local[{args.cores}]")
         .config("spark.driver.memory",
                 os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
         .config("spark.local.dir", "/dev/shm/spark-scratch")
         .config("spark.driver.extraJavaOptions",
                 f"-XX:+UseParallelGC -XX:ActiveProcessorCount={args.cores}")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false"))
    for k, v in recommended_conf(args.cores).items():
        b = b.config(k, v)
    b = b.config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    n = args.n_images
    cfg = FX.FixtureConfig(n=n, n_parts=256, with_bytes=False)
    fact = spark.read.parquet(os.path.join(args.data, f"images_{n}"))
    baseline = spark.read.parquet(os.path.join(args.data, f"baseline_{n}"))
    dims = {"dim_fmt": FX.dim_fmt_df(spark),
            "dim_license": FX.dim_license_df(spark, cfg)}
    scratch = "/dev/shm/spark-scratch/fuse-base"

    for run in range(args.runs):
        import shutil
        from concurrent.futures import ThreadPoolExecutor

        shutil.rmtree(scratch, ignore_errors=True)
        t0 = time.time()
        res = validate_table(fact, FX.SPEC_IMAGES, dims=dims,
                             baseline=baseline,
                             drift_columns=FX.drift_columns(),
                             fuse_scratch=scratch)
        t_construct = time.time() - t0

        t1 = time.time()
        sink_secs = {}

        def timed_sink(pair):
            name, df = pair
            s = time.time()
            df.write.format("noop").mode("overwrite").save()
            sink_secs[name] = round(time.time() - s, 2)

        with ThreadPoolExecutor(3) as ex:
            list(ex.map(timed_sink, [("violations", res.violations),
                                     ("verdicts", res.verdicts),
                                     ("stats", res.stats)]))
        t_sinks = time.time() - t1
        res.cleanup()
        spark.catalog.clearCache()
        print(json.dumps({
            "run": run, "cores": args.cores, "n_images": n,
            "construct_sec": round(t_construct, 2),
            "sinks_wall_sec": round(t_sinks, 2),
            "per_sink_sec": sink_secs,
            "total_sec": round(t_construct + t_sinks, 2),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
