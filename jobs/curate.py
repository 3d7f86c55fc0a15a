"""spark-submit entry point for the curation -> chunk -> shard pipeline.

    spark-submit --master local[8] jobs/curate.py \
        --input /root/testdata/sf0.001 --output /tmp/curated [--n-shards 8]

Prints one summary line (shards_written = partitions actually written
this run; < S on a --resume that found intact shards):
    curate input=<sf_dir> docs=N kept_train=K chunks=C shards=S \
        shards_written=W tokens=T wall=Ws
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="sf dir holding documents.parquet (and peers)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-shards", type=int, default=None)
    ap.add_argument("--shuffle-partitions", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="verify shard partitions already on disk against "
                         "the recomputed manifest; rewrite only "
                         "missing/mismatching shards")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("t2p-curate")
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 args.shuffle_partitions)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from t2p_spark.curate import run_curation_job

    t0 = time.monotonic()
    s = run_curation_job(spark, args.input, args.output,
                         n_shards=args.n_shards, resume=args.resume)
    dt = time.monotonic() - t0
    print(f"curate input={args.input} docs={s['n_input']} "
          f"kept_train={s['n_kept_train']} chunks={s['n_chunks']} "
          f"shards={s['n_shards']} shards_written={s['n_shards_written']} "
          f"tokens={s['total_tokens']} wall={dt:.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
