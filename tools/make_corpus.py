"""Materialize a deterministic synthetic docs corpus to parquet.

    python tools/make_corpus.py --out /tmp/corpus --n-docs 2000 [--seed 42]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-docs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--partitions", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from t2p_spark.schema import DOCS_SCHEMA
    from t2p_spark.synth import corpus_rows

    spark = (
        SparkSession.builder.appName("t2p-make-corpus")
        .config("spark.sql.shuffle.partitions", str(args.partitions))
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    # generate driver-side in chunks to bound memory, write append
    chunk = 1000
    written = 0
    mode = "overwrite"
    buf = []
    for row in corpus_rows(args.n_docs, seed=args.seed, chunk_size=1 << 20):
        buf.append(row)
        if len(buf) >= chunk:
            spark.createDataFrame(buf, schema=DOCS_SCHEMA).repartition(
                args.partitions
            ).write.mode(mode).parquet(args.out)
            written += len(buf)
            buf, mode = [], "append"
            print(f"wrote {written}/{args.n_docs}")
    if buf:
        spark.createDataFrame(buf, schema=DOCS_SCHEMA).repartition(
            max(1, args.partitions // 4)
        ).write.mode(mode).parquet(args.out)
        written += len(buf)
    print(f"done: {written} docs -> {args.out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
