"""Extra benchmarks for the r07 optimization round (guide §1.4 noop-sink
isolation + phase timing + plan capture). bench.py is FROZEN; everything
exploratory lives here.

    python bench_extra.py phases            # time the shared building blocks
    python bench_extra.py query NAME [...]  # cold+warm noop-sink timing
    python bench_extra.py plans TAG NAME [...]  # plans/r07/<name>_<tag>.txt

Session conf mirrors bench.py exactly so numbers are comparable.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_session():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("t2p-bench-extra")
        .config("spark.sql.shuffle.partitions", str(CPUS * 2))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def warmup(spark):
    import pyarrow as pa

    def _warm(batches):
        import t2p_spark.kernel  # noqa: F401
        n = 0
        for b in batches:
            n += b.num_rows
        yield pa.RecordBatch.from_arrays([pa.array([n], pa.int64())],
                                         names=["n"])

    (spark.range(10000).repartition(CPUS * 2)
     .selectExpr("cast(id as string) doc_id")
     .mapInArrow(_warm, "n long").count())


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn):
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    print(f"## {label}: {dt:.3f}s", file=sys.stderr, flush=True)
    return out


def cmd_phases(spark):
    from t2p_spark.relational import register_views
    from t2p_spark.textkit import (
        _minhash_select, ensure_documents_tok, spark_sql_queries,
    )

    t("register_views", lambda: register_views(spark, SF_DIR))
    t("documents.count", lambda: spark.table("documents").count())
    t("ensure_documents_tok (build+materialize)", lambda: (
        ensure_documents_tok(spark),
        spark.table("documents_tok").count()))
    t("documents_tok warm count", lambda: spark.table("documents_tok").count())
    t("minhash sigs (noop)", lambda: noop(spark.sql(_minhash_select("s"))))
    t("minhash sigs again (noop)", lambda: noop(spark.sql(_minhash_select("s"))))
    spark.sql(_minhash_select("s")).createOrReplaceTempView("sigs_mat")
    t("lsh pairs over view (noop)", lambda: noop(
        spark.sql(spark_sql_queries()["dedup_minhash_lsh"])))
    t("lsh pairs again (noop)", lambda: noop(
        spark.sql(spark_sql_queries()["dedup_minhash_lsh"])))


def cmd_query(spark, names):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        t0 = time.monotonic()
        n = qs[name](spark, SF_DIR).count()
        print(f"## {name}: cold {time.monotonic()-t0:.3f}s ({n} rows)",
              file=sys.stderr, flush=True)
        t0 = time.monotonic()
        qs[name](spark, SF_DIR).count()
        print(f"## {name}: warm {time.monotonic()-t0:.3f}s",
              file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)


def _build_df(spark, name):
    """Pseudo-queries for the materialized-relation BUILD plans (the
    declared queries read the cached views; the builds carry the scale-
    relevant join shapes the audit checks)."""
    from t2p_spark import textkit
    from t2p_spark.relational import register_views

    register_views(spark, SF_DIR)
    textkit.ensure_documents_tok(spark)
    if name == "pairs_mat_build":
        textkit.ensure_minhash_sigs(spark)
        return spark.sql(textkit.lsh_pairs_build_sql())
    if name == "sigs_mat_build":
        from t2p_spark.textkit import _minhash_select
        return spark.sql(_minhash_select("s"))
    if name == "tokcap_mat_build":
        textkit.prepare_textkit_views(spark, "ngram_jaccard_pairs")
        return spark.sql(textkit.tokcap_build_sql())
    raise KeyError(name)


def cmd_plans(spark, tag, names):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "plans", "r07")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name.endswith("_build"):
            df = _build_df(spark, name)
        else:
            df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"## wrote {name}_{tag}.txt", file=sys.stderr, flush=True)


def main():
    cmd = sys.argv[1]
    spark = make_session()
    warmup(spark)
    if cmd == "phases":
        cmd_phases(spark)
    elif cmd == "query":
        cmd_query(spark, sys.argv[2:])
    elif cmd == "plans":
        cmd_plans(spark, sys.argv[2], sys.argv[3:])
    else:
        raise SystemExit(f"unknown cmd {cmd}")
    spark.stop()


if __name__ == "__main__":
    main()
