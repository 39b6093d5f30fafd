"""Stage-attribution profile of the extraction dial cell (VERDICT r4 #5).

The scale dial's worst (still sublinear) growth cell is the full
extraction job: 16.3 s at 100k docs → 127.5 s at 1M (7.8× wall at 10×
input on fixed cores). This script attributes that wall time by pipeline
stage at BOTH scales, same boot, using cumulative-leg decomposition: each
leg materializes a strictly longer prefix of the plan with a `noop` sink
(compute without write cost), so successive differences isolate one stage
each. Legs mirror `riptide_spark/plans/pipeline.py:extraction_plan`
step-for-step (cited inline); the final legs split the real parquet write
from the read-back count that `run_extraction_job` performs for the
manifest row count.

    leg1 scan_gate   — parquet scan → oversize blank → gate (pure codegen)
                       → pre-shuffle column prune        (pipeline.py:63-98)
    leg2 + shuffle    — repartition_for_extraction       (pipeline.py:99-100)
    leg3 + extract    — Arrow-batched extraction UDF + flatten
                                                         (pipeline.py:102-137)
    leg4 + write      — real partitionBy(url_bucket) parquet append
    leg5 read-back    — run_id-filtered count of the written table
                                                         (pipeline.py:208-213)

Usage: python scripts/profile_extraction.py [--cpus 32] [--scales 0.1 1.0]
Prints one JSON line; also appends nothing — paste results into BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)  # executor python workers resolve riptide_spark from cwd

from pyspark.sql import functions as F  # noqa: E402


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def profile_scale(spark, n_pages: int, cpus: int) -> dict:
    from bench import ensure_corpus
    from riptide_spark.operators.extract_udf import (
        extract_udf,
        extraction_mode_for_route,
    )
    from riptide_spark.operators.gate_cols import with_gate
    from riptide_spark.operators.partitioning import (
        repartition_for_extraction,
        with_partitioning,
    )
    from riptide_spark.plans.pipeline import (
        MAX_CONTENT_BYTES,
        ExtractionJobConfig,
        run_extraction_job,
    )

    pages = spark.read.parquet(ensure_corpus(spark, n_pages))

    # Warm-up identical to the dial cell: JVM codegen + Python workers.
    warm = tempfile.mkdtemp(prefix="riptide_prof_warm_")
    run_extraction_job(
        spark,
        pages.limit(256),
        ExtractionJobConfig(output_path=os.path.join(warm, "out"), resume=False),
    )

    # --- plan prefixes, mirroring extraction_plan step-for-step ---------
    df = pages.withColumn(
        "_oversize_bytes",
        F.when(F.octet_length("html") > MAX_CONTENT_BYTES, F.octet_length("html")),
    ).withColumn(
        "html",
        F.when(F.col("_oversize_bytes").isNotNull(), F.lit(b"")).otherwise(
            F.col("html")
        ),
    )
    df = with_gate(df)
    df = df.withColumn(
        "content_mode",
        F.when(F.col("_oversize_bytes").isNotNull(), F.lit("oversize")).otherwise(
            F.col("content_mode")
        ),
    )
    df = with_partitioning(df)
    pruned = df.select(
        "url", "html", "content_mode", "url_bucket", "salt", "_oversize_bytes"
    )
    shuffled = repartition_for_extraction(pruned, cpus * 2)
    mode = extraction_mode_for_route(F.col("content_mode"))
    extracted = shuffled.withColumn(
        "ex", extract_udf(F.col("html"), F.col("url"), mode)
    ).select(
        "url",
        F.col("ex.extracted_text").alias("extracted_text"),
        F.col("ex.quality_score").alias("quality_score"),
        F.col("ex.error").alias("error"),
        "content_mode",
        "url_bucket",
    )

    # Untimed first touch of the scan: file listing + parquet footer
    # caches otherwise land entirely in leg1 and skew the shuffle delta.
    _noop(pruned)

    legs = {}
    legs["leg1_scan_gate"] = _noop(pruned)
    legs["leg2_plus_shuffle"] = _noop(shuffled)
    legs["leg3_plus_extract"] = _noop(extracted)

    out_dir = tempfile.mkdtemp(prefix="riptide_prof_out_")
    t0 = time.perf_counter()
    result = run_extraction_job(
        spark,
        pages,
        ExtractionJobConfig(
            output_path=os.path.join(out_dir, "out"),
            target_partitions=cpus * 2,
            resume=False,
        ),
    )
    legs["full_job"] = round(time.perf_counter() - t0, 3)

    # Split the full job's tail: real write+readback re-measured directly.
    t0 = time.perf_counter()
    n = (
        spark.read.parquet(os.path.join(out_dir, "out", "data"))
        .filter(F.col("run_id") == result.run_id)
        .select("url")
        .count()
    )
    legs["readback_count"] = round(time.perf_counter() - t0, 3)
    assert n == n_pages, (n, n_pages)

    deltas = {
        "scan_gate_prune": legs["leg1_scan_gate"],
        "shuffle": round(legs["leg2_plus_shuffle"] - legs["leg1_scan_gate"], 3),
        "extract_udf": round(legs["leg3_plus_extract"] - legs["leg2_plus_shuffle"], 3),
        "parquet_write_plus_readback": round(
            legs["full_job"] - legs["leg3_plus_extract"], 3
        ),
        "readback_alone": legs["readback_count"],
    }
    return {"docs": n_pages, "legs": legs, "deltas": deltas}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--scales", type=float, nargs="+", default=[0.1, 1.0])
    args = ap.parse_args()
    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)

    from bench import PAGES_PER_SF
    from riptide_spark.session import build_session

    out = {"cpus": args.cpus, "per_sf": {}}
    for sf in args.scales:
        spark = build_session(
            f"riptide-profile-sf{sf}",
            master=f"local[{args.cpus}]",
            shuffle_partitions=args.cpus,
        )
        spark.sparkContext.setLogLevel("ERROR")
        n_pages = max(int(PAGES_PER_SF * sf), 1000)
        out["per_sf"][str(sf)] = profile_scale(spark, n_pages, args.cpus)
        spark.stop()

    lo, hi = (str(s) for s in args.scales[:1] + args.scales[-1:])
    if lo != hi:
        out["delta_growth"] = {
            k: round(
                out["per_sf"][hi]["deltas"][k]
                / max(out["per_sf"][lo]["deltas"][k], 1e-9),
                2,
            )
            for k in out["per_sf"][lo]["deltas"]
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
