"""Exact resume: interrupted run + resume == uninterrupted run (north_rule)."""

import glob
import os
import shutil

import pyspark.sql.functions as F

from t2p_spark.checkpoint import run_extract_job
from t2p_spark.fixtures import fixture_doc_rows
from t2p_spark.schema import DOCS_SCHEMA


def _bucket_metrics(spark, path):
    return {
        r["bucket"]: (r["n_docs"], r["n_ok"], r["n_spans"], r["span_checksum"])
        for r in spark.read.parquet(path).collect()
    }


def test_exact_resume_after_partial_failure(spark, tmp_path):
    docs = spark.createDataFrame(
        list(fixture_doc_rows(chunk_size=1 << 20)), schema=DOCS_SCHEMA
    )
    inp = str(tmp_path / "docs")
    docs.repartition(4).write.parquet(inp)

    # reference run, uninterrupted
    run_extract_job(spark, inp, str(tmp_path / "out_full"),
                    str(tmp_path / "m_full"), run_id="full",
                    parallelism=2, n_buckets=8)
    want = _bucket_metrics(spark, str(tmp_path / "m_full"))

    # interrupted run: simulate a crash after some buckets committed by
    # running fully, then deleting 3 buckets' output + metrics rows
    out2, m2 = str(tmp_path / "out_r"), str(tmp_path / "m_r")
    run_extract_job(spark, inp, out2, m2, run_id="r1",
                    parallelism=2, n_buckets=8)
    victims = sorted(want)[:3]
    keep = spark.read.parquet(m2).filter(~F.col("bucket").isin(victims))
    keep_rows = keep.collect()
    shutil.rmtree(m2)
    spark.createDataFrame(keep_rows, keep.schema).write.parquet(m2)
    for b in victims:
        for d in glob.glob(os.path.join(out2, f"bucket={b}")):
            shutil.rmtree(d)

    # resume: must reprocess exactly the victims
    metrics = run_extract_job(spark, inp, out2, m2, run_id="r2",
                              parallelism=2, n_buckets=8, resume=True)
    redone = {r["bucket"] for r in metrics.collect()}
    assert redone == set(victims)

    got = _bucket_metrics(spark, m2)
    assert got == want  # identical per-bucket counts + span checksums

    # resume again: nothing left to do
    metrics2 = run_extract_job(spark, inp, out2, m2, run_id="r3",
                               parallelism=2, n_buckets=8, resume=True)
    assert metrics2.count() == 0
