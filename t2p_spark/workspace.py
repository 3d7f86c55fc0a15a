"""OCR-D METS workspace resolution — the reference's corpus entry point.

The reference resolves its fixture corpus through an OCR-D workspace:
``/root/reference/tests/test_workspace.py:17-22`` builds
``Resolver().workspace_from_url`` over ``tests/workspace/mets.xml`` and pairs
each page's image with its Textract JSON and reference PAGE-XML via the METS
fileSec + physical structMap. This module re-derives that resolution with the
stdlib only (no ocrd/lxml/PIL dependency):

  - ``parse_mets``: fileSec hrefs grouped by the physical structMap's page
    divs — one ``WorkspacePage`` per page with image / Textract JSON /
    reference PAGE-XML paths resolved relative to the mets.xml directory.
    Files are classified by MIMETYPE (``image/*``, PAGE's
    ``application/vnd.prima.page+xml``, JSON otherwise), not by fileGrp
    name, so renamed groups (the reference uses USE="AWS") still resolve.
  - ``image_dims``: pure byte-header sniffer for JPEG (SOF frame), TIFF
    (IFD tags 256/257) and PNG (IHDR) — the only image metadata the
    pipeline needs; no codec, so it works in this container and on
    executors without image libraries.
  - ``workspace_doc_rows``: the same interleaved ``(doc_id, spans)`` rows
    as ``fixtures.fixture_doc_rows``, so a METS workspace is just another
    corpus source for the Spark pipeline (``docs_from_workspace`` wraps it
    in a DataFrame). Pages whose image is not materialized locally (OCR-D
    workspaces may reference remote files; the reference test downloads
    them) take dims from the caller-supplied ``dims`` map instead.
"""

from __future__ import annotations

import os
import struct
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Tuple

_METS = "{http://www.loc.gov/METS/}"
_XLINK = "{http://www.w3.org/1999/xlink}"

PAGE_XML_MIME = "application/vnd.prima.page+xml"


@dataclass
class WorkspacePage:
    page_id: str
    image_path: Optional[str]
    textract_path: Optional[str]
    page_xml_path: Optional[str]


def _classify(mimetype: str, href: str = "") -> Optional[str]:
    """image/* -> image, PAGE mime -> page_xml, JSON (by mimetype or .json
    href) -> textract, anything else (ALTO, plain text, PDF, ...) -> None
    so an unrelated fileGrp in a richer workspace can never shadow the
    real Textract JSON."""
    if mimetype.startswith("image/"):
        return "image"
    if mimetype == PAGE_XML_MIME:
        return "page_xml"
    if (mimetype in ("application/json", "text/json")
            or mimetype.endswith("+json")
            or href.lower().endswith(".json")):
        return "textract"
    return None


def parse_mets(mets_path: str) -> List[WorkspacePage]:
    """Resolve a METS file into per-page (image, textract, page_xml) paths.

    Mirrors what the reference obtains from OCR-D's Resolver: the physical
    structMap's page divs give the page grouping; each fptr's FILEID is
    looked up in the fileSec for its MIMETYPE and FLocat href. Hrefs are
    returned as paths relative to the mets.xml directory (local workspace
    layout); they are NOT required to exist — callers decide how to handle
    unmaterialized (remote) files.
    """
    base = os.path.dirname(os.path.abspath(mets_path))
    root = ET.parse(mets_path).getroot()

    files: Dict[str, Tuple[str, str]] = {}  # FILEID -> (kind, path)
    for f in root.iter(f"{_METS}file"):
        fid = f.get("ID")
        mimetype = f.get("MIMETYPE", "")
        flocat = f.find(f"{_METS}FLocat")
        if fid is None or flocat is None:
            continue
        href = flocat.get(f"{_XLINK}href")
        if not href:
            continue
        kind = _classify(mimetype, href)
        if kind is None:
            continue
        path = href if os.path.isabs(href) else os.path.join(base, href)
        files[fid] = (kind, path)

    pages: List[WorkspacePage] = []
    for smap in root.iter(f"{_METS}structMap"):
        if smap.get("TYPE") != "PHYSICAL":
            continue
        for div in smap.iter(f"{_METS}div"):
            if div.get("TYPE") != "page":
                continue
            got: Dict[str, str] = {}
            for fptr in div.findall(f"{_METS}fptr"):
                entry = files.get(fptr.get("FILEID", ""))
                if entry:
                    # first fptr of each kind wins: a page div that also
                    # points at derived outputs (e.g. a binarized second
                    # image) must not overwrite the primary file
                    got.setdefault(entry[0], entry[1])
            # doc_id = Textract JSON basename (the unit the goldens and the
            # reference's own test walk key on); METS div IDs are XML-ID
            # mangled (leading digits get a letter prefix) so they are NOT
            # a stable join key across fileGrps
            tex = got.get("textract")
            page_id = (os.path.splitext(os.path.basename(tex))[0]
                       if tex else div.get("ID", ""))
            pages.append(WorkspacePage(
                page_id=page_id,
                image_path=got.get("image"),
                textract_path=tex,
                page_xml_path=got.get("page_xml"),
            ))
    return pages


def image_dims(path: str) -> Tuple[int, int]:
    """(width, height) from file headers alone: JPEG SOFn, TIFF IFD
    256/257, PNG IHDR. Raises ValueError for any other format and for
    truncated/corrupt headers (struct short-reads are wrapped)."""
    try:
        return _image_dims(path)
    except struct.error as e:
        raise ValueError(f"truncated image header: {path}") from e


def _image_dims(path: str) -> Tuple[int, int]:
    with open(path, "rb") as f:
        head = f.read(32)
        if head[:2] == b"\xff\xd8":  # JPEG: scan markers for a SOF frame
            f.seek(2)
            while True:
                marker = f.read(2)
                if len(marker) < 2:
                    raise ValueError(f"no SOF marker in JPEG {path}")
                if marker[0] != 0xFF:
                    raise ValueError(f"bad JPEG marker in {path}")
                code = marker[1]
                if code == 0xFF:  # spec-legal fill byte; re-read the code
                    f.seek(-1, os.SEEK_CUR)
                    continue
                if code in (0xD8, 0x01) or 0xD0 <= code <= 0xD7:
                    continue  # standalone markers, no length
                seg_len = struct.unpack(">H", f.read(2))[0]
                # SOF0-15 except DHT(C4)/JPG(C8)/DAC(CC)
                if 0xC0 <= code <= 0xCF and code not in (0xC4, 0xC8, 0xCC):
                    data = f.read(5)
                    height, width = struct.unpack(">HH", data[1:5])
                    return (width, height)
                f.seek(seg_len - 2, os.SEEK_CUR)
        if head[:4] in (b"II*\x00", b"MM\x00*"):  # TIFF
            bo = "<" if head[:2] == b"II" else ">"
            f.seek(4)
            (ifd_off,) = struct.unpack(bo + "I", f.read(4))
            f.seek(ifd_off)
            (n_entries,) = struct.unpack(bo + "H", f.read(2))
            width = height = None
            for _ in range(n_entries):
                tag, typ, _cnt, val = struct.unpack(bo + "HHII", f.read(12))
                if typ == 3:  # SHORT packs into the first 2 value bytes
                    val = val & 0xFFFF if bo == "<" else val >> 16
                if tag == 256:
                    width = val
                elif tag == 257:
                    height = val
            if width is None or height is None:
                raise ValueError(f"TIFF missing dimension tags: {path}")
            return (width, height)
        if head[:8] == b"\x89PNG\r\n\x1a\n":  # PNG IHDR
            width, height = struct.unpack(">II", head[16:24])
            return (width, height)
    raise ValueError(f"unrecognized image format: {path}")


def workspace_doc_rows(
    mets_path: str,
    dims: Optional[Dict[str, Tuple[int, int]]] = None,
    chunk_size: Optional[int] = None,
) -> Iterator[Tuple[str, List]]:
    """Interleaved (doc_id, spans) rows for every resolvable workspace page.

    A page resolves when its Textract JSON exists locally and its dims are
    known — sniffed from the local image when materialized, else taken from
    ``dims[page_id]`` (OCR-D workspaces routinely reference files the local
    copy has not downloaded). media_ref is the METS image href relative to
    the workspace root, matching the reference converter's imageFilename.
    Pages that cannot resolve are skipped silently — same contract as the
    reference's test walk, which only iterates materialized images.
    """
    from t2p_spark.fixtures import doc_row

    base = os.path.dirname(os.path.abspath(mets_path))
    for page in parse_mets(mets_path):
        if not page.textract_path or not os.path.exists(page.textract_path):
            continue
        wh: Optional[Tuple[int, int]] = None
        if page.image_path and os.path.exists(page.image_path):
            try:
                wh = image_dims(page.image_path)
            except ValueError:
                # unsniffable format (e.g. JPEG-2000) or corrupt header:
                # fall through to caller-supplied dims rather than dying —
                # one bad image must not kill the corpus build
                wh = None
        if wh is None and dims and page.page_id in dims:
            wh = tuple(dims[page.page_id])
        if wh is None:
            continue
        media_ref = (os.path.relpath(page.image_path, base)
                     if page.image_path else "")
        with open(page.textract_path, encoding="utf-8") as f:
            json_text = f.read()
        yield doc_row(page.page_id, json_text, wh[0], wh[1], media_ref,
                      chunk_size)


def docs_from_workspace(spark, mets_path: str,
                        dims: Optional[Dict[str, Tuple[int, int]]] = None,
                        chunk_size: Optional[int] = None):
    """The workspace as a docs-table DataFrame (input_hint schema) — feed
    straight into pipeline.extract / render_xml.render_pagexml_df."""
    from t2p_spark.schema import DOCS_SCHEMA

    return spark.createDataFrame(
        list(workspace_doc_rows(mets_path, dims, chunk_size)),
        schema=DOCS_SCHEMA,
    )
