"""One-off decomposition of the r7 cold-build tails (bench_extra sibling).

    python tools/probe_r7_tail.py

Times each shared build step separately, in the bench session conf.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"## {label}: {time.monotonic()-t0:.3f}s", file=sys.stderr, flush=True)
    return out


def main():
    import bench_extra as bx

    spark = bx.make_session()
    bx.warmup(spark)
    from t2p_spark import textkit
    from t2p_spark.relational import register_views

    t("register_views", lambda: register_views(spark, SF_DIR))
    t("documents_tok build", lambda: (textkit.ensure_documents_tok(spark),
                                      spark.table("documents_tok").count()))
    t("sigs_mat build", lambda: textkit.ensure_minhash_sigs(spark).count())
    t("pairs_mat build", lambda: (textkit.ensure_lsh_pairs(spark),
                                  spark.table("pairs_mat").count()))
    t("cc_mat build", lambda: textkit.ensure_cc_mat(spark).count())
    t("csh3_mat build", lambda: textkit.ensure_csh3(spark).count())
    sqls = textkit.spark_sql_queries()
    from t2p_spark.textkit import _CURATION_STAGES
    for view, qname in _CURATION_STAGES:
        if qname == "dedup_keep_list":
            continue
        t(f"gate {view} ({qname})", lambda q=qname: spark.sql(sqls[q]).count())
    t("keep_list", lambda: spark.sql(sqls["dedup_keep_list"]).count())
    t("curate_attrition_incr full (stages memoized? no — fresh path)",
      lambda: __import__("__spark_entry__").queries()[
          "curate_attrition_incr"](spark, SF_DIR).count())
    t("curate_attrition_incr warm",
      lambda: __import__("__spark_entry__").queries()[
          "curate_attrition_incr"](spark, SF_DIR).count())
    t("neardup_verified_pairs (pairs cached)",
      lambda: __import__("__spark_entry__").queries()[
          "neardup_verified_pairs"](spark, SF_DIR).count())
    spark.stop()


if __name__ == "__main__":
    main()
