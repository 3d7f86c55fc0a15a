"""t2p_spark — a PySpark-native layout-extraction engine.

Re-derives the semantics of slub/textract2page (AWS Textract JSON ->
PAGE-XML) as a distributed, vectorized span-extraction pipeline over an
Iceberg/Parquet table of interleaved text+media documents:

    docs(doc_id string,
         spans array<struct<kind string, text string, media_ref string, offset int>>)
      -> extracted(doc_id, spans, status, metrics...)

The output span sequence is byte-equal to the flattening of the reference
converter's PAGE-XML output (see FIXTURES.md §3 for the flattening spec and
``t2p_spark.flatten`` for its implementation).

Architecture (SURVEY.md §7):
  - ``schema``    fixed Textract / span / doc schemas (Spark + Arrow)
  - ``flatten``   PAGE-XML -> span list (golden derivation, stdlib ET)
  - ``convert``   pure-Python single-doc converter (the oracle)
  - ``kernel``    Arrow batch kernel wrapping the converter
  - ``pipeline``  DataFrame job: read -> salt/repartition -> kernel -> write
  - ``checkpoint``metrics/lineage table + exact resume
  - ``synth``     deterministic corpus generator
  - ``textkit``   training-data ops: dedup, similarity, language-ID, quality
  - ``ann``       embedding similarity search (brute-force + LSH-bucketed)
  - ``multimodal``binary media column plumbing (decode stubbed offline)
"""

__version__ = "0.1.0"
