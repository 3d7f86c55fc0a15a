"""Structured Streaming surfaces of the engine.

The reference is a batch converter (no streaming anywhere, SURVEY.md §2.7);
these are the natural streaming extensions a continuously-ingesting corpus
needs, built on the same kernels so batch/stream semantics are identical:

  - ``extract_stream``: the extraction pipeline as a stream — readStream
    over the docs table, the same ``extract_kernel`` via mapInArrow,
    per-microbatch bucket metrics through foreachBatch. Exactly-once lands
    on the same per-bucket idempotent commit as the batch job.
  - ``events_tumbling_stream``: watermarked tumbling-window aggregation of
    the events table (streaming twin of the batch
    ``events_tumbling_hour`` query; late data dropped past 2h).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from t2p_spark.kernel import extract_kernel
from t2p_spark.pipeline import assemble_payload
from t2p_spark.schema import DOCS_SCHEMA, EXTRACTED_SCHEMA


def read_docs_stream(spark: SparkSession, path: str,
                     max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def extract_stream(docs_stream: DataFrame) -> DataFrame:
    """Streaming extraction: same Column-only assembly + Arrow kernel.

    No shuffle inside the stream — one stage per microbatch; bucket
    assignment happens in foreachBatch at sink time (see run_extract_stream).
    """
    assembled = assemble_payload(docs_stream)
    return assembled.mapInArrow(extract_kernel, schema=EXTRACTED_SCHEMA)


def run_extract_stream(spark: SparkSession, input_path: str, output_path: str,
                       checkpoint_path: str, available_now: bool = True):
    """availableNow=True drains the current table once (backfill mode);
    False tails it continuously.

    Exactly-once: foreachBatch is at-least-once — on retry after a partial
    write the whole microbatch re-runs — so the sink must dedupe on batch_id.
    Partitioning by (batch_id, bucket) with dynamic partition overwrite makes
    a retry rewrite exactly its own batch_id partitions and nothing else:
    idempotent per microbatch, append across microbatches.
    """
    out = extract_stream(read_docs_stream(spark, input_path))

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        (batch_df
         .withColumn("batch_id", F.lit(batch_id))
         .withColumn(
             "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(64)).cast("int")
         )
         .write.mode("overwrite")
         .partitionBy("batch_id", "bucket")
         .parquet(output_path))

    writer = (
        out.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def events_tumbling_stream(events_stream: DataFrame) -> DataFrame:
    """Watermarked 1h tumbling windows per event_type (late data > 2h dropped)."""
    return (
        events_stream
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_bucket"),
            "event_type",
            "n_events",
            F.col("total_value").cast("double").alias("total_value"),
        )
    )


def run_events_stream(spark: SparkSession, events_path: str,
                      events_schema, checkpoint_path: str, query_name: str):
    stream = (
        spark.readStream.schema(events_schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(events_path)
    )
    agg = events_tumbling_stream(stream)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
