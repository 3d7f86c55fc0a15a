"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship: the extraction pipeline over the fixture
                    corpus (the product per BASELINE.json input_hint),
                    returning exploded span rows.
queries()         — every implemented operator from SURVEY.md §2 plus the
                    training-data operator suite (dedup / similarity /
                    text-analysis / relational), each as
                    (spark, sf_dir) -> DataFrame.
oracle_sql()      — DuckDB twins. Relational queries share one ANSI SQL
                    string with Spark; list-heavy ops have engineered
                    bit-identical twins (see t2p_spark/textkit.py);
                    the extraction flagship is checked against the
                    committed reference-derived goldens via read_json.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REPO = os.path.dirname(os.path.abspath(__file__))
import sys

if REPO not in sys.path:
    sys.path.insert(0, REPO)

GOLDEN_GLOB = os.path.join(REPO, "tests", "golden", "*.json")


# --- extraction queries ------------------------------------------------------

def _fixture_docs(spark: SparkSession) -> DataFrame:
    from t2p_spark.fixtures import fixture_doc_rows
    from t2p_spark.schema import DOCS_SCHEMA

    return spark.createDataFrame(
        list(fixture_doc_rows(chunk_size=1 << 20)), schema=DOCS_SCHEMA
    )


def extract_fixture_spans(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """Extraction flagship: 8-doc reference corpus -> exploded span rows.

    Oracle: the committed goldens (mechanical flattenings of the reference
    converter's PAGE-XML output) read by DuckDB — the same ground truth the
    pytest suite pins.
    """
    import pyspark.sql.functions as F

    from t2p_spark.pipeline import extract

    out = extract(_fixture_docs(spark), parallelism=4)
    return out.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.md5(F.col("s.text")).alias("text_md5"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def extract_synth_corpus(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """Deterministic 120-doc synthetic corpus through the full pipeline;
    returns per-doc status/metrics (rows-only check: the per-doc span
    equality vs the pure-Python oracle is asserted in pytest instead)."""
    import pyspark.sql.functions as F

    from t2p_spark.pipeline import extract
    from t2p_spark.schema import DOCS_SCHEMA
    from t2p_spark.synth import corpus_rows

    docs = spark.createDataFrame(
        list(corpus_rows(120, seed=7, chunk_size=1 << 20)), schema=DOCS_SCHEMA
    )
    out = extract(docs, parallelism=4)
    return out.select("doc_id", "status", "n_blocks", "n_spans").orderBy("doc_id")


def multimodal_meta(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """Binary-media plumbing: docs -> media table (fake codec) -> vectorized
    header parse. Rows-only check (content is generated in-flight)."""
    from t2p_spark.multimodal import media_meta, media_table_from_docs

    media = media_table_from_docs(_fixture_docs(spark))
    return media_meta(media).orderBy("media_id")


def multimodal_features(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """Deterministic byte-histogram features + frame sampling over the
    media table (offline-stub codec; production Arrow batch shapes)."""
    import pyspark.sql.functions as F

    from t2p_spark.multimodal import frame_sample, media_features, \
        media_table_from_docs

    media = media_table_from_docs(_fixture_docs(spark))
    feats = media_features(media)
    frames = frame_sample(media, every_n=4).groupBy("media_id").agg(
        F.count("*").alias("n_frames")
    )
    return (
        feats.join(frames, "media_id", "left")
        .select(
            "media_id",
            F.round(F.element_at("feature", 1), 6).alias("f0"),
            F.coalesce("n_frames", F.lit(0)).alias("n_frames"),
        )
        .orderBy("media_id")
    )


EXTRACT_FIXTURES_ORACLE = f"""
    SELECT doc_id,
           CAST(s->>0 AS VARCHAR) AS kind,
           md5(CAST(s->>1 AS VARCHAR)) AS text_md5,
           CAST(s->>2 AS VARCHAR) AS media_ref,
           CAST(s->>3 AS INT) AS offset
    FROM (
      SELECT doc_id, unnest(spans) AS s
      FROM read_json('{GOLDEN_GLOB}',
                     columns={{'doc_id': 'VARCHAR', 'spans': 'JSON[]'}})
    ) t
"""


# --- contract ----------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship smoke: full extraction pipeline on the reference corpus."""
    return extract_fixture_spans(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from t2p_spark.ann import ann_sql, run_ann
    from t2p_spark.relational import RELATIONAL_SQL, run_relational
    from t2p_spark.textkit import run_textkit, spark_sql_queries

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "extract_fixture_spans": extract_fixture_spans,
        "extract_synth_corpus": extract_synth_corpus,
        "multimodal_meta": multimodal_meta,
        "multimodal_features": multimodal_features,
    }
    for name in RELATIONAL_SQL:
        out[name] = (lambda n: lambda spark, sf: run_relational(spark, sf, n))(name)
    for name in spark_sql_queries():
        out[name] = (lambda n: lambda spark, sf: run_textkit(spark, sf, n))(name)
    for name in ann_sql("s"):
        out[name] = (lambda n: lambda spark, sf: run_ann(spark, sf, n))(name)
    return out


def oracle_sql() -> dict[str, str]:
    from t2p_spark.ann import ann_sql
    from t2p_spark.relational import RELATIONAL_SQL
    from t2p_spark.textkit import duckdb_oracle_queries

    out = {"extract_fixture_spans": EXTRACT_FIXTURES_ORACLE}
    out.update(RELATIONAL_SQL)          # shared ANSI SQL, verbatim
    out.update(duckdb_oracle_queries()) # engineered twins
    out.update(ann_sql("d"))
    # extract_synth_corpus: intentionally no oracle (non-SQL-expressible
    # converter); rows-only check + pytest spark==oracle sweep.
    return out
