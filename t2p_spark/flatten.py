"""PAGE-XML -> span sequence flattening (golden derivation).

Implements the flattening spec of FIXTURES.md §3 with stdlib
``xml.etree.ElementTree``: the committed reference PAGE-XMLs
(``/root/reference/tests/workspace/reference_page_xml/*.xml``, produced by
textract2page's ``convert_file``) are mechanically reduced to the ordered
span sequences that our pipeline must reproduce.

Span tuple: ``(kind, text, media_ref, offset)`` where ``text`` joins the
element's significant fields with the unit separator U+001F and ``offset``
is the 0-based position in the document's flattened sequence.

Reference serialization semantics this flattening relies on:
  - region emission order inside <Page> is converter construction order,
    while reading order lives in ReadingOrder/OrderedGroup
    (reference convert_aws.py:957-999, 1195-1202);
  - a regionRef with no matching element emits nothing (the unserialized
    KEY/VALUE path, SURVEY.md §2.8.2).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import List, Tuple

NS = "{http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15}"
US = "\x1f"  # unit separator — never occurs in corpus text

Span = Tuple[str, str, str, int]


def _tag(el: ET.Element) -> str:
    t = el.tag
    return t[len(NS):] if t.startswith(NS) else t


def _points(el: ET.Element) -> str:
    coords = el.find(f"{NS}Coords")
    return coords.get("points", "") if coords is not None else ""


def _own_text_equiv(el: ET.Element) -> str:
    """Unicode of the element's first *direct* TextEquiv child, or ''."""
    te = el.find(f"{NS}TextEquiv")
    if te is None:
        return ""
    uni = te.find(f"{NS}Unicode")
    return uni.text if uni is not None and uni.text is not None else ""


def _is_cell_region(el: ET.Element) -> bool:
    roles = el.find(f"{NS}Roles")
    return roles is not None and roles.find(f"{NS}TableCellRole") is not None


def _emit_element(el: ET.Element, media_ref: str, out: List[List]) -> None:
    """Pre-order emission of one region subtree (document order)."""
    tag = _tag(el)
    if tag == "TextRegion":
        if _is_cell_region(el):
            role = el.find(f"{NS}Roles").find(f"{NS}TableCellRole")
            fields = [
                _points(el),
                role.get("rowIndex", ""),
                role.get("columnIndex", ""),
                role.get("rowSpan", ""),
                role.get("colSpan", ""),
                role.get("header", ""),
            ]
            out.append(["cell", US.join(fields), ""])
        else:
            fields = [_points(el), el.get("type", ""), el.get("custom", "")]
            out.append(["region", US.join(fields), ""])
    elif tag == "ImageRegion":
        fields = [_points(el), el.get("type", ""), el.get("custom", "")]
        out.append(["media", US.join(fields), media_ref])
    elif tag == "TableRegion":
        fields = [_points(el), el.get("rows", ""), el.get("columns", "")]
        out.append(["table", US.join(fields), ""])
    elif tag == "TextLine":
        fields = [_points(el), _own_text_equiv(el)]
        out.append(["line", US.join(fields), ""])
    elif tag == "Word":
        fields = [_points(el), _own_text_equiv(el), el.get("production", "")]
        out.append(["word", US.join(fields), ""])
    # recurse into structural children (Coords/TextEquiv/Roles carry no spans)
    for child in el:
        if _tag(child) in ("TextRegion", "ImageRegion", "TableRegion",
                           "TextLine", "Word"):
            _emit_element(child, media_ref, out)


def flatten_page_xml(xml_text: str, media_ref: str = "") -> List[Span]:
    """Flatten one PAGE-XML document into its golden span sequence.

    1. Top-level order = ReadingOrder/OrderedGroup[@id='global-reading-order']
       entries sorted by @index.
    2. Each entry's @regionRef resolves to a direct region child of <Page>;
       emit that region's subtree pre-order. Unresolvable refs emit nothing.
    3. offset = 0-based position in the flattened sequence.
    """
    root = ET.fromstring(xml_text)
    page = root.find(f"{NS}Page")
    if page is None:
        return []

    regions_by_id = {}
    for child in page:
        if _tag(child) in ("TextRegion", "ImageRegion", "TableRegion"):
            rid = child.get("id")
            if rid is not None:
                regions_by_id[rid] = child

    order_entries: List[Tuple[int, str]] = []
    ro = page.find(f"{NS}ReadingOrder")
    if ro is not None:
        og = None
        for grp in ro.iter():
            if _tag(grp) == "OrderedGroup" and grp.get("id") == "global-reading-order":
                og = grp
                break
        if og is not None:
            for entry in og:
                if _tag(entry) in ("RegionRefIndexed", "OrderedGroupIndexed",
                                   "UnorderedGroupIndexed"):
                    order_entries.append(
                        (int(entry.get("index")), entry.get("regionRef"))
                    )
    order_entries.sort(key=lambda t: t[0])

    out: List[List] = []
    for _, region_ref in order_entries:
        el = regions_by_id.get(region_ref)
        if el is not None:
            _emit_element(el, media_ref, out)

    return [(k, t, m, i) for i, (k, t, m) in enumerate(out)]


def page_dims(xml_text: str) -> Tuple[int, int, str]:
    """(imageWidth, imageHeight, imageFilename) from a PAGE-XML document."""
    root = ET.fromstring(xml_text)
    page = root.find(f"{NS}Page")
    return (
        int(page.get("imageWidth")),
        int(page.get("imageHeight")),
        page.get("imageFilename", ""),
    )
