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

import os

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


def extract_stream(docs_stream: DataFrame,
                   max_payload_bytes: int | None = None) -> DataFrame:
    """Streaming extraction: same Column-only assembly + Arrow kernel.

    No shuffle inside the stream — one stage per microbatch; bucket
    assignment happens in foreachBatch at sink time (see run_extract_stream).
    Oversized docs quarantine (PayloadTooLarge) exactly as in batch extract —
    one pathological arriving doc must not kill the long-running stream.
    ``max_payload_bytes`` defaults to the batch cap (pipeline 1GiB).
    """
    from t2p_spark.pipeline import MAX_PAYLOAD_BYTES

    if max_payload_bytes is None:
        max_payload_bytes = MAX_PAYLOAD_BYTES
    assembled = assemble_payload(docs_stream,
                                 max_payload_bytes=max_payload_bytes)
    return assembled.mapInArrow(extract_kernel, schema=EXTRACTED_SCHEMA)


def write_extract_batch(batch_df: DataFrame, batch_id: int,
                        output_path: str) -> None:
    """Idempotent microbatch sink: partitioned by (batch_id, bucket) with
    dynamic partition overwrite, so a retried microbatch rewrites exactly
    its own batch_id partitions — at-least-once delivery becomes
    effectively-once durable output."""
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


def run_extract_stream(spark: SparkSession, input_path: str, output_path: str,
                       checkpoint_path: str, available_now: bool = True,
                       max_payload_bytes: int | None = None):
    """availableNow=True drains the current table once (backfill mode);
    False tails it continuously.

    Exactly-once: foreachBatch is at-least-once — on retry after a partial
    write the whole microbatch re-runs — so the sink must dedupe on batch_id.
    Partitioning by (batch_id, bucket) with dynamic partition overwrite makes
    a retry rewrite exactly its own batch_id partitions and nothing else:
    idempotent per microbatch, append across microbatches.
    """
    out = extract_stream(read_docs_stream(spark, input_path),
                         max_payload_bytes=max_payload_bytes)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        write_extract_batch(batch_df, batch_id, output_path)

    writer = (
        out.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def events_sessionize_stream(events_stream: DataFrame,
                             gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator: per-user sessionization as a stream via
    ``applyInPandasWithState`` — the streaming twin of the batch
    ``events_sessionize`` query (same 30-min inactivity gap, same
    (ts, event_id) tie-break).

    State per user: (last event epoch, session count, event count).
    Each microbatch folds its events into the state with a vectorized
    numpy gap test and emits the RUNNING totals (output mode "update");
    once the stream drains, the last emitted row per user equals the
    batch aggregate. At scale this is one shuffle on user_id per
    microbatch with O(users) state, the canonical stateful-streaming
    shape.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_sec = float(gap_minutes * 60)

    def fn(key, pdf_iter, state):
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            ts = (pd.to_datetime(pdf["ts"]).astype("int64") / 1e9).to_numpy()
            prev = np.empty_like(ts)
            prev[0] = last_ts if last_ts is not None else -np.inf
            prev[1:] = ts[:-1]
            n_sessions += int((ts > prev + gap_sec).sum())
            n_events += len(ts)
            batch_max = float(ts.max())
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
        })

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_sessions long, n_events long",
        stateStructType="last_ts double, n_sessions long, n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessionize_stream(spark: SparkSession, events_path: str,
                          events_schema, checkpoint_path: str,
                          query_name: str):
    # maxFilesPerTrigger=2: the drain's per-microbatch fixed cost
    # (offset/commit log writes, one state-store instance per shuffle
    # partition, job scheduling) dominates at bench scale, so the backfill
    # batches two chunk files per trigger — still >= 2 stateful
    # microbatches over the 4 staged chunks, so state genuinely crosses
    # batch boundaries; a 100-TB backfill does exactly this (availableNow
    # with large maxFilesPerTrigger / maxBytesPerTrigger). The drained
    # result is trigger-granularity-invariant (oracle-checked).
    stream = (
        spark.readStream.schema(events_schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(events_path)
    )
    agg = events_sessionize_stream(stream)
    return (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


_STAGED: dict = {}


def _stage_chronological_chunks(spark: SparkSession, sf_dir: str,
                                n_chunks: int = 4):
    """Stage the events table as n_chunks chronologically-disjoint parquet
    files written in order (the file stream replays them oldest-first by
    modification time) — a faithful replay of how a landing zone receives
    history, and the precondition for stream==batch equality: the stateful
    gap fold assumes batches arrive in time order, and the watermark drops
    data arriving >2h late. Returns (dir, schema); memoized per
    (session, sf_dir) — the staged replay of an immutable table is itself
    immutable, and both streamed driver queries share it."""
    import tempfile

    from pyspark.sql import Window

    from t2p_spark.session import session_key

    key = (session_key(spark), sf_dir, n_chunks)
    if key in _STAGED:
        return _STAGED[key]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out_dir = tempfile.mkdtemp(prefix="t2p_events_stream_")
    rn = F.row_number().over(Window.orderBy("ts", "event_id"))
    # cache the ranked relation: each chunk write filters it, and without
    # the cache every write re-runs the global (ts, event_id) sort —
    # n_chunks full sorts for one staging pass (r7 optimization round)
    chunked = ev.withColumn("_rn", rn).cache()
    n = chunked.count()
    per = (n + n_chunks - 1) // n_chunks
    # FileStreamSource orders files by mtime at ms resolution: two chunk
    # writes landing in the same millisecond could replay out of order and
    # break the time-order precondition above (the 2h watermark would then
    # drop rows — an intermittent oracle flake, r3 ADVICE). Pin each
    # chunk's part-file mtime explicitly in chunk order.
    pinned: set = set()
    base_mtime = os.stat(out_dir).st_mtime
    for i in range(n_chunks):
        (chunked
         .filter((F.col("_rn") > i * per) & (F.col("_rn") <= (i + 1) * per))
         .drop("_rn").coalesce(1).write.mode("append").parquet(out_dir))
        for f in os.listdir(out_dir):
            if f.startswith("part-") and f not in pinned:
                t = base_mtime + (i + 1) * 10.0
                os.utime(os.path.join(out_dir, f), (t, t))
                pinned.add(f)
    chunked.unpersist()
    _STAGED[key] = (out_dir, ev.schema)
    return _STAGED[key]


class _stream_shuffle_partitions:
    """Temporarily cap spark.sql.shuffle.partitions for a drain: each
    stateful microbatch spins one state-store instance PER shuffle
    partition per batch — at a bench-style 64 partitions x 4 batches the
    fixed state-store overhead dwarfs the (tiny) data. The default is
    scale-adaptive (half the session's core count, floor 8): the
    per-GROUP pandas invocation inside applyInPandasWithState is the
    drain's real cost, so too few partitions serializes Python work
    (measured: 2 partitions 9.0s, 8 -> 3.2-5.1s, 16 -> 2.8-3.1s on 32
    cores), while partitions >> cores only multiply state-store
    instances. Fresh checkpoints pin their own partition count, so the
    cap never leaks into a resumed stream; the previous session value is
    restored on exit."""

    def __init__(self, spark: SparkSession, n: int | None = None):
        if n is None:
            n = max(8, spark.sparkContext.defaultParallelism // 2)
        self.spark, self.n = spark, n

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


_STREAM_SEQ = [0]

# driver-query name -> the last drained run's FINAL microbatch executed
# plan (explainInternal over lastExecution). Streams have no batch
# DataFrame whose plan tools/audit_plans.py could explain, so each drain
# records its own executed plan here and the audit reads it back — the
# same scale screening (joins/shuffles/red flags) the batch queries get.
LAST_STREAM_PLANS: dict[str, str] = {}


def _next_qname(prefix: str) -> str:
    _STREAM_SEQ[0] += 1
    return f"{prefix}_{_STREAM_SEQ[0]}"


def _drain(q, audit_name: str) -> None:
    """awaitTermination + record the last microbatch's executed plan
    under ``audit_name`` (best-effort: plan capture must never fail a
    drain — py4j internals are version-sensitive)."""
    q.awaitTermination()
    try:
        from pyspark import SparkContext

        jvm = SparkContext._active_spark_context._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted")
        # StreamingQueryWrapper -> StreamExecution -> IncrementalExecution
        # (a QueryExecution): the formatted executed plan of the final
        # microbatch, same shape tools/audit_plans.py parses for batch
        LAST_STREAM_PLANS[audit_name] = (
            q._jsq.streamingQuery().lastExecution().explainString(mode))
    except Exception:  # pragma: no cover - capture is diagnostic only
        try:
            LAST_STREAM_PLANS[audit_name] = q._jsq.explainInternal(True)
        except Exception:
            pass


def sessionize_streamed_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-oracle surface for the stateful sessionization stream: drain
    the applyInPandasWithState stream over chronological chunks with
    availableNow and return the FINAL per-user totals. The update-mode
    memory sink accumulates one row per (user, microbatch); running totals
    only grow, so MAX per user is the drained state. Oracle: the batch
    events_sessionize window SQL (RELATIONAL_SQL) — hash equality means
    the stateful streaming operator reproduces the batch semantics."""
    import tempfile

    path, schema = _stage_chronological_chunks(spark, sf_dir)
    qname = _next_qname("sess_streamed")
    with _stream_shuffle_partitions(spark):
        q = run_sessionize_stream(spark, path, schema,
                                  tempfile.mkdtemp(prefix="t2p_ck_"), qname)
        _drain(q, "events_sessionize_streamed")
    return spark.sql(f"""
        SELECT user_id,
               MAX(n_sessions) AS n_sessions,
               MAX(n_events) AS n_events
        FROM {qname} GROUP BY user_id
    """)


def tumbling_streamed_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-oracle surface for the watermarked tumbling-window stream:
    drain over chronological chunks (complete output mode — the memory
    table IS the final aggregate). Oracle: the batch events_tumbling_hour
    SQL. Chronological replay matters: the 2h watermark would drop
    genuinely-late rows if chunks arrived out of order."""
    import tempfile

    path, schema = _stage_chronological_chunks(spark, sf_dir)
    qname = _next_qname("tumbling_streamed")
    with _stream_shuffle_partitions(spark):
        q = run_events_stream(spark, path, schema,
                              tempfile.mkdtemp(prefix="t2p_ck_"), qname)
        _drain(q, "events_tumbling_streamed")
    return spark.sql(
        f"SELECT event_type, hour_bucket, n_events, total_value "
        f"FROM {qname}"
    )


def dedup_streamed_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming duplicate suppression — the exactly-once ingestion shape:
    a landing zone redelivers events (at-least-once feeds always do), the
    stream drops redeliveries with stateful ``dropDuplicates`` on the
    event key, and the durable output contains each event once.

    The replay is the staged chronological chunks PLUS a final chunk that
    redelivers a deterministic ~5% sample of earlier events (md5-bucket
    of event_id — twin-checkable, no random()), so the duplicates
    genuinely cross microbatch boundaries and exercise the dedup state
    store. Oracle: the batch per-type counts over the original events
    table — hash equality means every redelivery was suppressed and
    nothing real was lost. At scale: state is one key per event in the
    retention window; production feeds bound it with
    ``dropDuplicatesWithinWatermark``."""
    import glob
    import shutil
    import tempfile

    path, schema = _stage_chronological_chunks(spark, sf_dir)
    dup_dir = tempfile.mkdtemp(prefix="t2p_events_dup_")
    for f in glob.glob(f"{path}/*.parquet"):
        shutil.copy(f, dup_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    (ev.where("CAST(CONV(SUBSTRING(md5(CAST(event_id AS STRING)), 1, 8), "
              "16, 10) AS BIGINT) % 100 < 5")
     .coalesce(1).write.mode("append").parquet(dup_dir))

    qname = _next_qname("dedup_streamed")
    with _stream_shuffle_partitions(spark):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(dup_dir)
        )
        q = (
            stream.dropDuplicates(["event_id"])
            .writeStream.outputMode("append")
            .format("memory").queryName(qname)
            .option("checkpointLocation",
                    tempfile.mkdtemp(prefix="t2p_ck_"))
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, "events_stream_dedup")
    return spark.sql(f"""
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM {qname} GROUP BY event_type
    """)


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

def _stage_document_chunks(spark: SparkSession, sf_dir: str,
                           n_chunks: int = 3):
    """Stage the 'incoming' documents slice (doc_id % 4 == 0) as n_chunks
    parquet files written in doc_id order — the landing-zone replay for
    the stream-static near-dup screen. Memoized per (session, sf_dir),
    like the events staging."""
    import tempfile

    from pyspark.sql import Window

    from t2p_spark.session import session_key

    key = (session_key(spark), sf_dir, "docs", n_chunks)
    if key in _STAGED:
        return _STAGED[key]
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where("doc_id % 4 = 0"))
    out_dir = tempfile.mkdtemp(prefix="t2p_docs_stream_")
    rn = F.row_number().over(Window.orderBy("doc_id"))
    # cached for the same reason as the events staging: one sort, n_chunks
    # cheap filtered writes
    chunked = docs.withColumn("_rn", rn).cache()
    n = chunked.count()
    per = (n + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        (chunked
         .filter((F.col("_rn") > i * per) & (F.col("_rn") <= (i + 1) * per))
         .drop("_rn").coalesce(1).write.mode("append").parquet(out_dir))
    chunked.unpersist()
    _STAGED[key] = (out_dir, docs.schema)
    return _STAGED[key]


def _band_key_array(col_fmt: str, n_minhash: int) -> str:
    """array(concat(sig0,sig1), concat(sig2,sig3), ...) with each signature
    slot rendered through col_fmt (index -> SQL expression)."""
    return ("array(" + ", ".join(
        f"concat({col_fmt.format(2 * i)}, {col_fmt.format(2 * i + 1)})"
        for i in range(n_minhash // 2)) + ")")


def neardup_screen_streamed_result(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Incremental near-dup screening — the ingestion-time shape of
    MinHash-LSH dedup: new documents arrive as a stream and are screened
    against the *existing* corpus's signature index before admission.

    Spark-first composition:
      - static side: the band index of the existing corpus (doc_id % 4
        <> 0) — the batch _minhash_select over the cached documents_tok,
        band-exploded and cached once; every microbatch reuses it (at
        scale: a broadcast- or bucket-joined index table maintained by
        the batch dedup job);
      - stream side: signatures computed IN the stream projection via
        minhash_sig_inline (HOF let-binding, no Python, no cache needed),
        band-exploded, stream-static equi-join on (band, key) — stateless,
        so each microbatch is one hash join against the index;
      - stateful ``dropDuplicates`` on the (new, corpus) pair emits each
        screening hit exactly once even when several bands collide or a
        redelivered file repeats a document.

    Oracle: the batch DuckDB twin joining new-slice signatures against
    corpus-slice signatures on any shared band (neardup_screen_oracle_sql).
    """
    import tempfile

    from t2p_spark.relational import register_views
    from t2p_spark.textkit import (
        N_MINHASH, ensure_documents_tok, ensure_minhash_sigs,
        minhash_sig_inline,
    )

    register_views(spark, sf_dir)
    ensure_documents_tok(spark)
    path, schema = _stage_document_chunks(spark, sf_dir)
    band_static = _band_key_array("sig_{}", N_MINHASH)
    # the corpus signature table is the shared sigs_mat materialization
    # (the batch dedup job maintains it; the screen only band-explodes it)
    index = (
        ensure_minhash_sigs(spark)
        .where("doc_id % 4 <> 0")
        .selectExpr("doc_id AS corpus_doc_id",
                    f"posexplode({band_static}) AS (band, key)")
        .cache()
    )
    band_stream = _band_key_array("sigs[{}]", N_MINHASH)
    qname = _next_qname("neardup_streamed")
    try:
        with _stream_shuffle_partitions(spark):
            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", 2).parquet(path))
            s_bands = (
                stream
                .selectExpr("doc_id", f"{minhash_sig_inline()} AS sigs")
                .selectExpr("doc_id AS new_doc_id",
                            f"posexplode({band_stream}) AS (band, key)")
            )
            pairs = (s_bands.join(index, ["band", "key"])
                     .select("new_doc_id", "corpus_doc_id")
                     .dropDuplicates(["new_doc_id", "corpus_doc_id"]))
            q = (pairs.writeStream.outputMode("append")
                 .format("memory").queryName(qname)
                 .option("checkpointLocation",
                         tempfile.mkdtemp(prefix="t2p_ck_"))
                 .trigger(availableNow=True)
                 .start())
            _drain(q, "stream_neardup_screen")
    finally:
        index.unpersist()
    # no final DISTINCT: if the stream ever emitted a pair twice, the
    # oracle hash-compare must see it
    return spark.sql(
        f"SELECT new_doc_id, corpus_doc_id FROM {qname}")


def neardup_screen_oracle_sql() -> str:
    """DuckDB twin of the streamed screen: new-slice x corpus-slice
    signature join on any shared 2-signature band."""
    from t2p_spark.textkit import N_MINHASH, _minhash_select

    or_arms = "\n           OR ".join(
        f"(n.sig_{2*i} = c.sig_{2*i} AND n.sig_{2*i+1} = c.sig_{2*i+1})"
        for i in range(N_MINHASH // 2))
    return f"""
        WITH sigs AS ({_minhash_select("d")})
        SELECT n.doc_id AS new_doc_id, c.doc_id AS corpus_doc_id
        FROM sigs n JOIN sigs c
          ON n.doc_id % 4 = 0 AND c.doc_id % 4 <> 0
        WHERE {or_arms}
    """


def pii_screen_streamed_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time PII screening: incoming documents are scanned for
    emails/phones/key-shaped tokens BEFORE admission to the corpus — the
    compliance gate a landing zone runs on every arriving file.

    Spark-first composition: the detection is the SAME vectorized
    regexp SQL as the batch ``pii_scrub`` twin, applied verbatim to a
    streaming temp view — stateless per microbatch (no watermark, no
    state store), whole-stage codegen, zero Python. Using the identical
    SQL text for stream and batch is the point: the stream IS the batch
    operator incrementalized, so the oracle (the DuckDB pii twin over
    the same incoming slice) pins stream == batch semantics exactly.
    """
    import tempfile

    from t2p_spark.relational import register_views
    from t2p_spark.textkit import spark_sql_queries

    register_views(spark, sf_dir)
    path, schema = _stage_document_chunks(spark, sf_dir)
    qname = _next_qname("pii_streamed")
    vname = f"{qname}_in"
    with _stream_shuffle_partitions(spark):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 2).parquet(path))
        stream.createOrReplaceTempView(vname)
        # the batch twin's SQL, retargeted at the stream view verbatim;
        # the uniqueness assert guards the prefix-substring replace (a
        # future "FROM documents_tok" reference would match too and
        # silently corrupt the SQL — r5 ADVICE)
        pii_sql = spark_sql_queries()["pii_scrub"]
        assert pii_sql.count("FROM documents") == 1
        pii_sql = pii_sql.replace("FROM documents", f"FROM {vname}")
        out = spark.sql(pii_sql)
        q = (out.writeStream.outputMode("append")
             .format("memory").queryName(qname)
             .option("checkpointLocation", tempfile.mkdtemp(prefix="t2p_ck_"))
             .trigger(availableNow=True)
             .start())
        _drain(q, "stream_pii_screen")
    return spark.sql(
        f"SELECT doc_id, n_emails, n_phones, n_keys, redacted_md5 "
        f"FROM {qname}")


def pii_screen_oracle_sql() -> str:
    """DuckDB twin: the batch pii query restricted to the incoming slice
    (doc_id % 4 = 0 — the same slice _stage_document_chunks replays)."""
    from t2p_spark.textkit import duckdb_oracle_queries

    sql = duckdb_oracle_queries()["pii_scrub"]
    assert sql.count("FROM documents") == 1
    return sql.replace("FROM documents",
                       "FROM documents WHERE doc_id % 4 = 0")


def quality_gate_streamed_result(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Ingestion-time quality gate — the third screen of the landing-zone
    triad (near-dup screen, PII screen, quality gate): every arriving
    document gets the batch ``corpus_filter`` verdict (Gopher/C4-style
    per-doc rules) BEFORE admission.

    Spark-first composition: the batch twin's SQL retargeted at the
    stream, with the tokenization inlined into the stream projection
    (the cached documents_tok view cannot back a stream; the quality
    features fold over the token array a handful of times, so the
    re-tokenization cost is bounded — unlike the shingle/bit element
    access patterns that need the cached view). Stateless microbatches,
    zero Python. The per-doc rules depend only on the document itself,
    so stream == batch verdicts exactly — pinned by the oracle.
    """
    import tempfile

    from t2p_spark.relational import register_views
    from t2p_spark.textkit import _hash60, _tokens, _xform, spark_sql_queries

    register_views(spark, sf_dir)
    path, schema = _stage_document_chunks(spark, sf_dir)
    qname = _next_qname("quality_streamed")
    vname = f"{qname}_in"
    inline_tok = (
        f"(SELECT doc_id, source, n_chars, text, "
        f"{_tokens('text', 's')} AS toks, "
        f"{_xform(_tokens('text', 's'), 't -> ' + _hash60('t', 's'), 's')}"
        f" AS thashes FROM {vname})")
    with _stream_shuffle_partitions(spark):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 2).parquet(path))
        stream.createOrReplaceTempView(vname)
        gate_sql = spark_sql_queries()["corpus_filter"].replace(
            "documents_tok", inline_tok)
        out = spark.sql(gate_sql)
        q = (out.writeStream.outputMode("append")
             .format("memory").queryName(qname)
             .option("checkpointLocation", tempfile.mkdtemp(prefix="t2p_ck_"))
             .trigger(availableNow=True)
             .start())
        _drain(q, "stream_quality_gate")
    return spark.sql(
        f"SELECT doc_id, verdict, n_tokens FROM {qname}")


def quality_gate_oracle_sql() -> str:
    """DuckDB twin: the batch corpus_filter restricted to the incoming
    slice (doc_id % 4 = 0, the _stage_document_chunks replay)."""
    from t2p_spark.textkit import duckdb_oracle_queries

    sql = duckdb_oracle_queries()["corpus_filter"]
    assert sql.count("FROM documents)") == 1
    return sql.replace("FROM documents)",
                       "FROM documents WHERE doc_id % 4 = 0)")
