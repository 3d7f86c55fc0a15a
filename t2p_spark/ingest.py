"""Ingest adapter: raw Textract JSON file directories -> the docs table.

The reference's native input is ONE pretty-printed Textract JSON file per
document plus the page image (for pixel dims) — reference
convert_aws.py:746-747 (json.load) and :704-725 (PIL dims). A user
switching from the reference points this adapter at that directory plus a
dims table (doc_id, width, height, media_ref) — the dims a real lake
carries as media metadata (this sandbox has no PIL, exactly like the
reference's convert_file_without_image path takes dims explicitly).

Everything is Column-only (wholetext scan -> filename-derived doc_id ->
dims join -> span-array construction); the output is the canonical
interleaved docs(doc_id, spans) table of FIXTURES.md §1, byte-equivalent
to what fixtures.doc_row builds in Python — so the whole extraction
correctness chain applies to ingested directories unchanged.

Scale notes: one row per FILE (wholetext) — fine for Textract responses
(KB-MB each); doc-id skew does not exist (ids are filenames); the dims
join broadcasts when the dims table is small, shuffles otherwise. The
chunked span encoding keeps per-span text below chunk_size so downstream
row-group/page sizes stay bounded.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def docs_from_json_dir(spark: SparkSession, json_dir: str,
                       dims: DataFrame,
                       chunk_size: int = 1 << 20,
                       streaming: bool = False,
                       with_quarantine: bool = False):
    """(json files under json_dir) x dims(doc_id, width, height, media_ref)
    -> docs(doc_id, spans) in the interleaved span encoding.

    streaming=True returns the same table as an UNBOUNDED stream
    (readStream over the directory — a landing zone continuously receiving
    Textract responses); feed it to streaming.extract_stream for
    end-to-end streaming extraction with the idempotent sink.

    with_quarantine=True returns (docs, quarantined) where quarantined is
    (doc_id, reason) for files whose doc_id has no dims row — otherwise
    those are dropped, which at lake scale silently loses documents.

    input_file_name() returns a URL-ENCODED URI: filenames with spaces,
    '%', or '#' arrive percent-encoded and would never match the dims key
    (r2 ADVICE) — decode before extracting the stem (try_ variant:
    malformed escapes keep the raw name rather than failing the scan).
    """
    reader = spark.readStream if streaming else spark.read
    fname = F.input_file_name()
    decoded = F.coalesce(F.call_function("try_url_decode", fname), fname)
    raw = (
        reader.format("text").option("wholetext", "true").load(json_dir)
        .select(
            F.regexp_extract(decoded, r"([^/]+)\.json$", 1).alias("doc_id"),
            F.col("value").alias("json_text"),
        )
    )
    j = raw.join(dims, "doc_id", "left" if with_quarantine else "inner")

    media_span = F.struct(
        F.lit("media").alias("kind"),
        F.concat_ws("x", F.col("width").cast("string"),
                    F.col("height").cast("string")).alias("text"),
        F.col("media_ref").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil(F.length("json_text") / F.lit(chunk_size)).cast("int"),
    )
    text_spans = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.lit("text").alias("kind"),
            F.col("json_text")
            .substr(i * chunk_size + 1, F.lit(chunk_size)).alias("text"),
            F.lit("").alias("media_ref"),
            (i + 1).cast("int").alias("offset"),
        ),
    )
    docs = j.filter(F.col("width").isNotNull()) if with_quarantine else j
    docs = docs.select(
        "doc_id",
        F.concat(F.array(media_span), text_spans).alias("spans"),
    )
    if with_quarantine:
        quarantined = j.filter(F.col("width").isNull()).select(
            "doc_id", F.lit("missing_dims").alias("reason"))
        return docs, quarantined
    return docs
