"""spark-submit entry point for the extraction pipeline.

    spark-submit --master local[32] --py-files t2p_spark.zip \
        jobs/extract.py --input /data/docs --output /data/extracted \
        --metrics /data/metrics --run-id run1 [--resume] [--parallelism N]

Input: parquet/Iceberg docs table (doc_id, spans) per FIXTURES.md §1.
Output: extracted spans table partitioned by bucket + per-bucket metrics.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--metrics", required=True)
    ap.add_argument("--run-id", default="run")
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import pyspark.sql.functions as F
    from t2p_spark.checkpoint import run_extract_job

    spark = (
        SparkSession.builder.appName(f"t2p-extract-{args.run_id}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .getOrCreate()
    )
    t0 = time.monotonic()
    metrics = run_extract_job(
        spark,
        input_path=args.input,
        output_path=args.output,
        metrics_path=args.metrics,
        run_id=args.run_id,
        parallelism=args.parallelism,
        n_buckets=args.n_buckets,
        resume=args.resume,
    )
    agg = metrics.agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("docs"),
        F.coalesce(F.sum("n_ok"), F.lit(0)).alias("ok"),
        F.coalesce(F.sum("n_quarantined"), F.lit(0)).alias("quarantined"),
        F.coalesce(F.sum("n_spans"), F.lit(0)).alias("spans"),
    ).collect()[0]
    dt = time.monotonic() - t0
    docs = agg["docs"] or 0
    print(
        f"extract run_id={args.run_id} docs={docs} ok={agg['ok']} "
        f"quarantined={agg['quarantined']} spans={agg['spans']} "
        f"wall={dt:.2f}s throughput={docs / dt if dt else 0:.1f} docs/s"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
