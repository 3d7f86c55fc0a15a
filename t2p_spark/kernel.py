"""Arrow batch kernel: columnar doc batches -> extracted span batches.

JVM->Python crosses exactly once per Arrow batch (``mapInArrow``); inside a
batch the per-document conversion is the shared ``convert_doc_safe`` logic —
the same code pytest validates against the reference goldens, so Spark==oracle
by construction. No row-at-a-time Python UDFs anywhere (input_hint
constraint); the payload assembly / dimension parsing upstream of this kernel
is pure Column ops (see ``t2p_spark.pipeline``).

Batch shape in:  doc_id string, width int32, height int32,
                 media_ref string, json_text string(large ok)
Batch shape out: EXTRACTED_SCHEMA (doc_id, spans, status, error,
                 n_blocks, n_spans)
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

import pyarrow as pa

from t2p_spark.convert import convert_doc_safe

try:  # orjson (Rust) parses ~2x faster than stdlib json, identical dicts;
    # gate behind import-try so the kernel runs on any worker image
    import orjson

    _loads = orjson.loads
except ImportError:  # pragma: no cover
    _loads = json.loads

SPAN_ARROW = pa.list_(pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
]))

EXTRACTED_ARROW = pa.schema([
    ("doc_id", pa.string()),
    ("spans", SPAN_ARROW),
    ("status", pa.string()),
    ("error", pa.string()),
    ("n_blocks", pa.int32()),
    ("n_spans", pa.int32()),
    ("span_fp", pa.int64()),
])


def _fingerprint(doc_id: str, spans) -> int:
    """Order-sensitive 63-bit fingerprint of the span sequence.

    Computed here, while the data is hot, so the metrics aggregation never
    has to re-read the (large) spans column — at corpus scale re-hashing
    the output would re-scan everything.

    One md5 over one joined buffer — byte-identical stream to the original
    per-field update loop (UTF-8 of a concatenation == concatenation of
    UTF-8), so checksums stay comparable across engine versions.
    """
    parts = [doc_id]
    parts.extend(f"\x1d{k}\x1e{t}\x1e{m}\x1e{o}" for k, t, m, o in spans)
    digest = hashlib.md5("".join(parts).encode()).digest()
    return int.from_bytes(digest[:8], "big") & 0x7FFFFFFFFFFFFFFF


def _convert_batch(batch: pa.RecordBatch) -> pa.RecordBatch:
    widths = batch.column("width").to_pylist()
    heights = batch.column("height").to_pylist()
    media_refs = batch.column("media_ref").to_pylist()
    payloads = batch.column("json_text").to_pylist()

    # columnar span construction: flat value arrays + list offsets — no
    # per-span Python dicts (the naive from_pylist path was the kernel's
    # hotspot, ~2x the conversion cost itself)
    kinds: list = []
    texts: list = []
    refs: list = []
    offs: list = []
    list_offsets = [0]
    status_col, error_col, nb_col, ns_col, fp_col = [], [], [], [], []

    # oversized-payload marker from assemble_payload(max_payload_bytes=...):
    # non-NULL byte count == the doc exceeded the cap and json_text was
    # deliberately left unbuilt (one such row would overflow Arrow's int32
    # string offsets and kill the stage — quarantine it instead)
    if "payload_bytes" in batch.schema.names:
        oversizes = batch.column("payload_bytes").to_pylist()
    else:
        oversizes = [None] * batch.num_rows

    doc_ids = batch.column("doc_id").to_pylist()
    for doc_id, width, height, media_ref, payload, oversize in zip(
        doc_ids, widths, heights, media_refs, payloads, oversizes
    ):
        n_blocks = 0
        if oversize is not None:
            status, spans, error = (
                "quarantined", [],
                f"PayloadTooLarge: {oversize} bytes exceeds the "
                "max_payload_bytes cap (Arrow row limit)",
            )
        elif width is None or height is None or not payload:
            status, spans, error = (
                "quarantined", [], "InvalidDoc: missing media dims or payload"
            )
        else:
            try:
                aws = _loads(payload)
                if not isinstance(aws, dict):
                    raise ValueError(
                        f"payload is JSON {type(aws).__name__}, not an object"
                    )
                n_blocks = len(aws.get("Blocks") or [])
            except ValueError as exc:
                status, spans, error = "quarantined", [], f"JSONDecodeError: {exc}"
            else:
                status, spans, error = convert_doc_safe(
                    aws, width, height, media_ref or ""
                )
        if spans:
            ks, ts, ms, os_ = zip(*spans)
            kinds.extend(ks)
            texts.extend(ts)
            refs.extend(ms)
            offs.extend(os_)
        list_offsets.append(len(kinds))
        status_col.append(status)
        error_col.append(error)
        nb_col.append(n_blocks)
        ns_col.append(len(spans))
        fp_col.append(_fingerprint(doc_id, spans))

    span_struct = pa.StructArray.from_arrays(
        [
            pa.array(kinds, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(refs, pa.string()),
            pa.array(offs, pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans_arr = pa.ListArray.from_arrays(
        pa.array(list_offsets, pa.int32()), span_struct
    )
    return pa.RecordBatch.from_arrays(
        [
            batch.column("doc_id"),
            spans_arr,
            pa.array(status_col, type=pa.string()),
            pa.array(error_col, type=pa.string()),
            pa.array(nb_col, type=pa.int32()),
            pa.array(ns_col, type=pa.int32()),
            pa.array(fp_col, type=pa.int64()),
        ],
        schema=EXTRACTED_ARROW,
    )


def extract_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """mapInArrow entry point.

    The cycle GC is disabled *during* batch conversion: a many-block document
    inflates to millions of parsed-JSON dicts per batch and CPython's
    generational collector rescans them repeatedly (measured 2-4x wall-time
    variance). convert.py's object graph DOES contain parent/child reference
    cycles (Word<->Line, Cell<->Table, ...), so refcounting alone does not
    free it — a full ``gc.collect()`` runs after each batch to reclaim the
    per-document cycles, and gc is re-enabled when the iterator is exhausted
    so long-lived reused workers never accumulate garbage.
    """
    import gc

    gc_was_enabled = gc.isenabled()
    gc.disable()
    try:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            yield _convert_batch(batch)
            gc.collect()
    finally:
        if gc_was_enabled:
            gc.enable()
