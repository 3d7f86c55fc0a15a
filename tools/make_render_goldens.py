"""Golden canonical fingerprints for the PAGE-XML renderer.

Usage: python tools/make_render_goldens.py [--check]

For each committed reference PAGE-XML, records the md5 of its CANONICAL
form (Metadata children + Page/@imageFilename stripped, indentation
dropped, W3C C14N — t2p_spark.render_xml.canonical_form, the same
normalization the reference's own test applies). The driver's
``render_pagexml`` query computes the identical fingerprint from OUR
rendered XML in the Spark kernel, so the DuckDB oracle row matching is
renderer == reference, NOT renderer == itself.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from t2p_spark.render_xml import canonical_md5  # noqa: E402

REF_XML_DIR = "/root/reference/tests/workspace/reference_page_xml"
OUT_PATH = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "golden_render", "render_canon_md5.json")


def main() -> int:
    check = "--check" in sys.argv
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    records = []
    for path in sorted(glob.glob(os.path.join(REF_XML_DIR, "*.xml"))):
        doc_id = os.path.basename(path)[:-4]
        xml = open(path, encoding="utf-8").read()
        records.append({
            "doc_id": doc_id,
            "status": "ok",
            "canon_md5": canonical_md5(xml),
        })
    if check:
        existing = json.load(open(OUT_PATH, encoding="utf-8"))
        assert existing == records, "render golden drift"
        print(f"checked {len(records)} records")
    else:
        with open(OUT_PATH, "w", encoding="utf-8") as f:
            json.dump(records, f, indent=1)
        print(f"wrote {len(records)} records")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
