"""METS workspace resolution parity (the reference's corpus entry point).

The reference's own test harness reaches its fixtures through an OCR-D
workspace (/root/reference/tests/test_workspace.py:17-22 resolves
tests/workspace/mets.xml, then pairs images/ with textract_responses/ and
reference_page_xml/). These tests pin that t2p_spark.workspace re-derives
the same resolution without the ocrd stack: same page set, same image dims
(sniffed from bytes where the reference used PIL), and byte-identical doc
rows to the fixtures module the rest of the suite builds on — so workspace
input is transitively covered by every extraction-parity test.

Pure-Python module: no Spark session needed.
"""

import os

from t2p_spark import workspace
from t2p_spark.fixtures import fixture_doc_rows, fixture_ids, golden_meta

METS = "/root/reference/tests/workspace/mets.xml"
WS = os.path.dirname(METS)


def test_parse_mets_resolves_every_fixture_page():
    pages = {p.page_id: p for p in workspace.parse_mets(METS)}
    # the reference workspace enumerates exactly the fixture corpus
    assert sorted(pages) == fixture_ids()
    for p in pages.values():
        assert p.textract_path and os.path.exists(p.textract_path)
        assert p.image_path  # href resolved even when not materialized
        assert p.page_xml_path and p.page_xml_path.endswith(
            f"{p.page_id}.xml")


def test_image_dims_sniffer_matches_reference_dims():
    """For every image materialized in the reference workspace, the pure
    byte sniffer must report the dims the goldens pinned (the goldens'
    dims came from the reference XMLs' imageWidth/imageHeight)."""
    pages = workspace.parse_mets(METS)
    sniffed = 0
    for p in pages:
        if not (p.image_path and os.path.exists(p.image_path)):
            continue
        meta = golden_meta(p.page_id)
        assert workspace.image_dims(p.image_path) == \
            (meta["width"], meta["height"]), p.page_id
        sniffed += 1
    assert sniffed >= 3  # jpgs materialized in the reference checkout


def test_workspace_rows_equal_fixture_rows():
    """With golden dims supplied for unmaterialized images, the workspace
    yields byte-identical rows to fixtures.fixture_doc_rows — the input
    every extraction-parity test (and the committed goldens) already pin."""
    dims = {d: (golden_meta(d)["width"], golden_meta(d)["height"])
            for d in fixture_ids()}
    got = sorted(workspace.workspace_doc_rows(METS, dims=dims,
                                              chunk_size=1 << 20))
    want = sorted(fixture_doc_rows(chunk_size=1 << 20))
    assert [r[0] for r in got] == [r[0] for r in want]
    for (gid, gspans), (wid, wspans) in zip(got, want):
        assert gspans == wspans, gid


def test_workspace_rows_skip_unresolvable_pages():
    """Without a dims fallback, only pages with a materialized image
    resolve — the contract of an offline partial workspace copy."""
    got = [r[0] for r in workspace.workspace_doc_rows(METS)]
    materialized = {p.page_id for p in workspace.parse_mets(METS)
                    if p.image_path and os.path.exists(p.image_path)}
    assert sorted(got) == sorted(materialized)
    assert len(got) >= 3
