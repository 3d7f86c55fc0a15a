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
    ap.add_argument("--compute-only", action="store_true",
                    help="run the extraction computation and count results "
                         "without writing output (isolates compute scaling "
                         "from the sandbox's single local disk)")
    ap.add_argument("--scan-only", action="store_true",
                    help="scan + payload assembly only, no kernel, no "
                         "write (phase attribution: read share)")
    ap.add_argument("--no-metrics", action="store_true",
                    help="extract + write output but skip the metrics "
                         "read-back/commit pass (phase attribution: "
                         "write share vs metrics share)")
    ap.add_argument("--prewarm", action="store_true",
                    help="spin up + warm the Python worker pool before the "
                         "timed window (steady-state measurement; a real "
                         "cluster amortizes worker startup over hours)")
    ap.add_argument("--max-partition-bytes", default=None,
                    help="spark.sql.files.maxPartitionBytes override; "
                         "smaller splits balance doc-size skew (e.g. 16m "
                         "for JSON-heavy corpora)")
    ap.add_argument("--reader-batch-rows", default="256",
                    help="spark.sql.parquet.columnarReaderBatchSize. The "
                         "default 4096 is row-count-bounded, so on huge-"
                         "string corpora one reader batch reserves "
                         "rows x payload bytes (measured 134MB+ per task "
                         "here; x concurrent tasks = a multi-GB allocation "
                         "burst that anti-scales the scan and OOMs small "
                         "heaps). 256 bounds the burst; measured 5.3x "
                         "faster at local[16] on the 64k skew corpus with "
                         "identical output")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import pyspark.sql.functions as F
    from t2p_spark.checkpoint import run_extract_job

    builder = (
        SparkSession.builder.appName(f"t2p-extract-{args.run_id}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        .config("spark.sql.parquet.columnarReaderBatchSize",
                args.reader_batch_rows)
    )
    if args.max_partition_bytes:
        builder = builder.config(
            "spark.sql.files.maxPartitionBytes", args.max_partition_bytes
        )
    spark = builder.getOrCreate()

    if args.prewarm:
        import pyarrow as pa

        def _warm(batches):
            import t2p_spark.kernel  # noqa: F401 — pulls pyarrow/pandas into workers
            n = 0
            for b in batches:
                n += b.num_rows
            yield pa.RecordBatch.from_arrays(
                [pa.array([n], pa.int64())], names=["n"]
            )

        (spark.range(10000)
         .repartition(spark.sparkContext.defaultParallelism * 2)
         .selectExpr("cast(id as string) doc_id")
         .mapInArrow(_warm, "n long").count())

    if args.scan_only:
        from t2p_spark.pipeline import assemble_payload

        t0 = time.monotonic()
        docs = spark.read.parquet(args.input).drop("bucket")
        # aggregate over the payload column so the scan + assembly cannot
        # be pruned away (a bare count() would skip the text columns)
        row = assemble_payload(docs).agg(
            F.count("*").alias("n"),
            F.sum(F.length("json_text")).alias("payload_chars"),
        ).collect()[0]
        dt = time.monotonic() - t0
        n = row["n"] or 0
        print(
            f"extract[scan_only] run_id={args.run_id} docs={n} ok=0 "
            f"quarantined=0 spans=0 wall={dt:.2f}s "
            f"scan_docs_per_s={n / dt if dt else 0:.1f}"
        )
        spark.stop()
        return 0

    if args.compute_only:
        from t2p_spark.pipeline import extract

        t0 = time.monotonic()
        docs = spark.read.parquet(args.input).drop("bucket")
        out = extract(docs, parallelism=args.parallelism)
        agg = out.groupBy("status").count().collect()
        dt = time.monotonic() - t0
        counts = {r["status"]: r["count"] for r in agg}
        docs_n = sum(counts.values())
        print(
            f"extract[compute_only] run_id={args.run_id} docs={docs_n} "
            f"ok={counts.get('ok', 0)} "
            f"quarantined={counts.get('quarantined', 0)} spans=0 "
            f"wall={dt:.2f}s throughput={docs_n / dt if dt else 0:.1f} docs/s"
        )
        spark.stop()
        return 0

    if args.no_metrics:
        from t2p_spark.io_tables import write_extracted
        from t2p_spark.pipeline import extract

        t0 = time.monotonic()
        docs = spark.read.parquet(args.input)
        n = docs.count()  # parquet footer count — no data read
        clustered = "bucket" in docs.columns
        out = extract(docs.drop("bucket"), parallelism=args.parallelism,
                      n_buckets=args.n_buckets)
        write_extracted(spark, out, args.output,
                        n_buckets=args.n_buckets, clustered=clustered)
        dt = time.monotonic() - t0
        print(
            f"extract[no_metrics] run_id={args.run_id} docs={n} ok=0 "
            f"quarantined=0 spans=0 wall={dt:.2f}s "
            f"scan_docs_per_s={n / dt if dt else 0:.1f}"
        )
        spark.stop()
        return 0

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
    # the returned metrics DataFrame is local-backed (collected once inside
    # run_extract_job) — summarizing it launches no further output scans
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
