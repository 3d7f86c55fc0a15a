"""Materialize the pure-Python oracle's verdict for the 120-doc synth corpus.

Usage: python tools/make_synth_golden.py [--check]

Writes tests/golden_synth/synth_corpus_120.json — one record per document
with the per-doc metrics the `extract_synth_corpus` driver query returns
(doc_id, status, n_blocks, n_spans), computed by the SAME pure-Python
conversion the pytest golden suite validates against the reference
(t2p_spark.convert.convert_doc_safe), independently of Spark. The DuckDB
driver oracle reads this file via read_json, closing the `no_oracle` gap:
Spark kernel == committed pure-Python oracle, hash-checked per round.

Deterministic: corpus_rows(120, seed=7) — identical to the driver query.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from t2p_spark.convert import convert_doc_safe  # noqa: E402
from t2p_spark.synth import corpus_rows  # noqa: E402

OUT_PATH = os.path.join(
    os.path.dirname(__file__), "..", "tests", "golden_synth",
    "synth_corpus_120.json",
)

N_DOCS = 120
SEED = 7


def doc_metrics(spans) -> dict:
    """Pure-Python twin of the kernel's per-doc path (t2p_spark.kernel)."""
    media = next((s for s in spans if s[0] == "media"), None)
    payload = "".join(
        s[1] for s in sorted(
            (s for s in spans if s[0] == "text"), key=lambda s: s[3]
        )
    )
    n_blocks = 0
    # reason = the kernel's normalized error class (the text before ':'):
    # 'InvalidDoc' / 'JSONDecodeError' / the convert_doc_safe exception
    # class — mirroring t2p_spark/kernel.py:90-107 exactly. The class (not
    # the message) is the twin-stable unit: orjson and json word their
    # parse errors differently.
    if media is None or not payload:
        status, out_spans, reason = "quarantined", [], "InvalidDoc"
    else:
        w, h = media[1].split("x")
        try:
            aws = json.loads(payload)
            if not isinstance(aws, dict):
                raise ValueError("payload is not a JSON object")
            n_blocks = len(aws.get("Blocks") or [])
        except ValueError:
            status, out_spans, reason = "quarantined", [], "JSONDecodeError"
        else:
            status, out_spans, err = convert_doc_safe(
                aws, int(w), int(h), media[2]
            )
            reason = err.split(":")[0] if err else ""
    # payload_bytes: the same sum the pipeline's oversized-payload guard
    # computes column-side (octet_length over text spans) — lets the
    # quarantine_oversize oracle replay the PayloadTooLarge cap rule
    payload_bytes = sum(
        len(s[1].encode("utf-8")) for s in spans if s[0] == "text"
    )
    return {"status": status, "n_blocks": n_blocks,
            "n_spans": len(out_spans), "reason": reason,
            "payload_bytes": payload_bytes}


def main() -> int:
    check = "--check" in sys.argv
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    records = []
    for doc_id, spans in corpus_rows(N_DOCS, seed=SEED, chunk_size=1 << 20):
        m = doc_metrics(spans)
        records.append({"doc_id": doc_id, **m})
    records.sort(key=lambda r: r["doc_id"])
    if check:
        existing = json.load(open(OUT_PATH, encoding="utf-8"))
        assert existing == records, "synth golden drift"
        print(f"checked {len(records)} records")
    else:
        with open(OUT_PATH, "w", encoding="utf-8") as f:
            json.dump(records, f, indent=1)
        print(f"wrote {len(records)} records")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
