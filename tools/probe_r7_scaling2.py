"""Scale-holding probe for the r7 SECOND-PASS rewrites (funnel report /
csh3_mat / cc build), at 1x / 4x / 16x synthetic corpora.

Corpus construction mirrors BENCH/scaling_r7_textkit.json: the sf0.1
documents table unioned k times with doc_id offsets and per-copy unique
tail tokens — worst-case for dedup (every doc gains k near-duplicates).

    python tools/probe_r7_scaling2.py [--scales 1 4 16]

Appends a JSON object to stdout; prose goes to BENCH/BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scaled_documents(spark, k: int):
    import pyspark.sql.functions as F

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = base.count()
    parts = []
    for i in range(k):
        parts.append(
            base.select(
                (F.col("doc_id") + i * n).alias("doc_id"),
                "source", "n_chars",
                F.concat("text", F.lit(f" uniquetail{i} copytok{i}"))
                 .alias("text"),
            ))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionAll(p)
    return df


def t(res, label, fn):
    t0 = time.monotonic()
    fn()
    res[label] = round(time.monotonic() - t0, 2)
    print(f"## {label}: {res[label]}s", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", nargs="*", type=int, default=[1, 4, 16])
    args = ap.parse_args()

    import bench_extra as bx
    from t2p_spark import textkit

    out = {}
    for k in args.scales:
        spark = bx.make_session()
        bx.warmup(spark)
        from t2p_spark.relational import register_views

        register_views(spark, SF_DIR)
        scaled_documents(spark, k).createOrReplaceTempView("documents")
        textkit.ensure_documents_tok(spark, force=True)
        res = out[str(k)] = {}
        t(res, "documents_tok build",
          lambda: spark.table("documents_tok").count())
        t(res, "csh3_mat build", lambda: textkit.ensure_csh3(spark).count())
        sqls = textkit.spark_sql_queries()
        t(res, "contamination gate (from csh3_mat)",
          lambda: spark.sql(sqls["contamination_check"]).count())
        t(res, "curate_attrition_incr full (cc+gates+report)",
          lambda: (textkit.prepare_textkit_views(spark,
                                                 "curate_attrition_incr"),
                   spark.sql(sqls["curate_attrition_incr"]).count()))
        t(res, "report warm (union-agg only)",
          lambda: spark.sql(sqls["curate_attrition_incr"]).count())
        spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
