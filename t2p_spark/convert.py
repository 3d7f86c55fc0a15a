"""Single-document Textract-JSON -> span-sequence converter (the oracle).

Re-derives, stage by stage, the semantics of the reference converter
``/root/reference/textract2page/convert_aws.py`` (slub/textract2page), but
emits the flattened span sequence of FIXTURES.md §3 directly instead of
PAGE-XML. Used three ways:

  1. as the pytest oracle validated against the flattened golden XMLs,
  2. inside the Arrow batch kernel (``t2p_spark.kernel``) — the per-document
     unit of work after columnar JSON assembly,
  3. by ``synth.py`` to compute goldens for generated corpora.

Reference crash paths (SURVEY.md §2.8) surface here as ordinary Python
exceptions; callers wrap them via :func:`convert_doc_safe` into quarantine
rows instead of killing the job — documents the reference would crash on
are *invalid input*, never silently mis-converted.

Citations in comments are file:line into the reference ``convert_aws.py``.
"""

from __future__ import annotations

import math
from operator import itemgetter
from typing import Dict, List, Optional, Tuple

_GET_XY = itemgetter("X", "Y")

Span = Tuple[str, str, str, int]

US = "\x1f"

# convert_aws.py:39
TEXT_TYPE_MAP = {"PRINTED": "printed", "HANDWRITING": "handwritten-cursive"}
# convert_aws.py:40-51
LAYOUT_TYPE_MAP = {
    "LAYOUT_TITLE": "heading",
    "LAYOUT_HEADER": "header",
    "LAYOUT_FOOTER": "footer",
    "LAYOUT_SECTION_HEADER": "heading",
    "LAYOUT_PAGE_NUMBER": "page-number",
    "LAYOUT_LIST": "other",
    "LAYOUT_FIGURE": "other",
    "LAYOUT_TABLE": "other",
    "LAYOUT_KEY_VALUE_SET": "other",
    "LAYOUT_TEXT": "paragraph",
}


# ---------------------------------------------------------------------------
# geometry — tagged tuples reproduce the reference dataclass equality
# (convert_aws.py:54-120; equality is used for the table<->LAYOUT_TABLE
#  match at :924)

def build_geometry(geom: Dict) -> tuple:
    """convert_aws.py:599-608 with the validation asserts of :65-67,:86-92,:107-108."""
    if "Polygon" in geom:
        try:
            # fast path: C-level itemgetter (~4x the dict-.get listcomp) —
            # the fallback re-runs the canonical form so every miss raises
            # the ORIGINAL exception (error strings are part of the contract)
            pts = tuple(map(_GET_XY, geom["Polygon"]))
        except (KeyError, TypeError):
            pts = tuple(
                [(p.get("X", -1.0), p.get("Y", -1.0)) for p in geom["Polygon"]]
            )
        if len(pts) > 16:
            # long polygons: C-speed range check; the per-point assert loop
            # re-runs only on violation to produce the exact reference
            # AssertionError. s == s is the NaN sentinel (NaN always
            # propagates through sum, but can hide from min/max).
            xs, ys = zip(*pts)
            s = sum(xs) + sum(ys)
            if not (0 <= min(xs) and max(xs) <= 1
                    and 0 <= min(ys) and max(ys) <= 1 and s == s):
                for x, y in pts:
                    assert 0 <= x <= 1, x  # :66
                    assert 0 <= y <= 1, y  # :67
        else:  # short polygons: the plain loop beats the zip/min/max setup
            for x, y in pts:
                assert 0 <= x <= 1, x  # :66
                assert 0 <= y <= 1, y  # :67
        assert len(pts) >= 3, len(pts)  # :108
        return ("P", pts)
    bbox = geom["BoundingBox"]
    try:
        left = bbox["Left"]
        top = bbox["Top"]
        width = bbox["Width"]
        height = bbox["Height"]
    except (KeyError, TypeError):
        left = bbox.get("Left", -1.0)
        top = bbox.get("Top", -1.0)
        width = bbox.get("Width", -1.0)
        height = bbox.get("Height", -1.0)
    assert 0 <= left <= 1, left          # :87
    assert 0 <= top <= 1, top            # :88
    assert 0 <= width <= 1, width        # :89
    assert 0 <= height <= 1, height      # :90
    assert width + left <= 1, (width, left)    # :91
    assert height + top <= 1, (height, top)    # :92
    return ("B", (left, top, width, height))


def points_from_geometry(geometry: tuple, w: int, h: int) -> str:
    """Pixel points string — convert_aws.py:567-596. ceil, never round."""
    kind, data = geometry
    if kind == "P":
        c = math.ceil
        return " ".join(
            [f"{c(x * w)},{c(y * h)}" for x, y in data]
        )
    left, top, width, height = data
    x1 = math.ceil(left * w)
    y1 = math.ceil(top * h)
    x2 = math.ceil((left + width) * w)
    y3 = math.ceil((top + height) * h)
    # clockwise TL TR BR BL (:573-582)
    return f"{x1},{y1} {x2},{y1} {x2},{y3} {x1},{y3}"


def _append_first_seen(dst: list, items) -> None:
    """First-seen append — identical semantics to the reference's
    ``x not in list`` loops (blocks have identity ``==``; None dedups to
    one entry either way). Tiny lists (the common cell/line case) use the
    plain linear scan; an id-set takes over once dst grows, so pathological
    many-line layouts stay O(n) instead of O(n^2)."""
    seen = None
    for it in items:
        if seen is None:
            if it not in dst:
                dst.append(it)
            if len(dst) > 32:
                seen = set(map(id, dst))
        else:
            k = id(it)
            if k not in seen:
                seen.add(k)
                dst.append(it)


def get_child_ids(block: Dict) -> List[str]:
    """First CHILD relationship group only — convert_aws.py:611-631 (§2.8.4).

    Crash parity: once any CHILD entry exists (probed with .get), the
    reference's comprehension evaluates ``rel["Type"]`` on EVERY
    relationship — a relationship dict missing "Type" raises KeyError
    (-> quarantine). A first-CHILD early return would skip that scan and
    convert such docs successfully, silently diverging from the reference
    (r2 ADVICE). Likewise Ids defaults via .get(.., []) — an explicit
    ``"Ids": null`` propagates None and crashes in the caller, as there.
    And the default must be .get("Relationships", []) with NO ``or []``
    coercion: an explicit ``"Relationships": null`` returns None and the
    any() scan raises TypeError (-> quarantine) in the reference too
    (r3 ADVICE).
    """
    rels = block.get("Relationships", [])
    if not any(r.get("Type") == "CHILD" for r in rels):
        return []
    return [r.get("Ids", []) for r in rels if r["Type"] == "CHILD"][0]


# ---------------------------------------------------------------------------
# block model — minimal mirrors of the reference classes; identity-based
# equality everywhere except geometry (tuples), exactly like the reference.

class _Block:
    __slots__ = ("id", "prefix", "geometry", "confidence")

    def _base(self, block: Dict, prefix: str) -> None:
        self.id = block.get("Id")
        self.prefix = prefix
        self.geometry = build_geometry(block.get("Geometry"))  # :130
        self.confidence = float(block.get("Confidence")) / 100  # :131


class Word(_Block):
    __slots__ = ("text", "text_type",
                 "parent_line", "parent_cell", "parent_layout",
                 "parent_value", "parent_key")

    def __init__(self, block: Dict) -> None:  # :406-421
        self._base(block, "textract-word")
        self.text = block.get("Text")
        self.text_type = TEXT_TYPE_MAP.get(block.get("TextType"))
        self.parent_line = None
        self.parent_cell = None
        self.parent_layout = None
        self.parent_value = None
        self.parent_key = None


class Line(_Block):
    __slots__ = ("text", "child_words",
                 "parent_cell", "parent_layout", "parent_value", "parent_key")

    def __init__(self, block: Dict, words: Dict[str, Word]) -> None:  # :273-292
        self._base(block, "textract-line")
        self.text = block.get("Text")
        # :284-286 — no None-filter: a non-WORD child id yields None and the
        # backref loop crashes (AttributeError), like the reference.
        self.child_words = [words.get(i) for i in get_child_ids(block)]
        for word in self.child_words:
            word.parent_line = self  # :287-288
        self.parent_cell = None
        self.parent_layout = None
        self.parent_value = None
        self.parent_key = None


class SelectionElement(_Block):
    __slots__ = ("selected", "parent_cell", "parent_value")

    def __init__(self, block: Dict, parent_cell=None, parent_value=None) -> None:  # :529-554
        self._base(block, "textract-selection-element")
        self.selected = block.get("SelectionStatus") == "SELECTED"
        self.parent_cell = parent_cell
        self.parent_value = parent_value


class _Cell(_Block):
    __slots__ = ("parent_table", "row_index", "column_index", "row_span",
                 "column_span", "column_header", "table_title", "table_footer",
                 "table_section_title", "table_summary")

    def _cell_base(self, block: Dict, parent_table, prefix: str) -> None:  # :295-312
        self._base(block, prefix)
        self.parent_table = parent_table
        self.row_index = int(block["RowIndex"]) - 1
        self.column_index = int(block["ColumnIndex"]) - 1
        self.row_span = int(block["RowSpan"])
        self.column_span = int(block["ColumnSpan"])
        ents = block.get("EntityTypes") or []
        self.column_header = "COLUMN_HEADER" in ents
        self.table_title = "TABLE_TITLE" in ents
        self.table_footer = "TABLE_FOOTER" in ents
        self.table_section_title = "TABLE_SECTION_TITLE" in ents
        self.table_summary = "TABLE_SUMMARY" in ents


class CommonCell(_Cell):
    __slots__ = ("parent_merged_cell", "child_words", "child_lines",
                 "child_selection_elements")

    def __init__(self, block, parent_table, selection_blocks, words) -> None:  # :331-369
        self._cell_base(block, parent_table, "textract-cell")
        self.parent_merged_cell = None
        child_ids = get_child_ids(block)
        self.child_words = [w for w in map(words.get, child_ids) if w]
        for word in self.child_words:
            word.parent_cell = self  # :351-352
        self.child_lines = []
        # :354-357 first-seen dedup
        _append_first_seen(self.child_lines,
                           (w.parent_line for w in self.child_words))
        for line in self.child_lines:
            line.parent_cell = self  # :358-359
        self.child_selection_elements = [
            SelectionElement(selection_blocks.get(i), parent_cell=self)
            for i in child_ids
            if selection_blocks.get(i)
        ]


class MergedCell(_Cell):
    __slots__ = ("child_cells", "child_words", "child_lines",
                 "child_selection_elements")

    def __init__(self, block, parent_table) -> None:  # :372-403
        self._cell_base(block, parent_table, "textract-merged-cell")
        child_cell_ids = get_child_ids(block)
        self.child_cells = []
        for cell_id in child_cell_ids:  # :384-389 nested loop, CHILD-id order
            for cell in parent_table.common_cells:
                if cell.id == cell_id:
                    self.child_cells.append(cell)
                    cell.parent_merged_cell = self
        self.child_words = [w for c in self.child_cells for w in c.child_words]
        self.child_lines = [l for c in self.child_cells for l in c.child_lines]
        self.child_selection_elements = [
            s for c in self.child_cells for s in c.child_selection_elements
        ]


class Table(_Block):
    __slots__ = ("structured", "common_cells", "merged_cells",
                 "ordered_lines", "rows", "columns", "parent_layout")

    def __init__(self, block, cell_blocks, merged_cell_blocks,
                 selection_blocks, words) -> None:  # :199-270
        self._base(block, "textract-table")
        self.structured = "STRUCTURED_TABLE" in (block.get("EntityTypes") or [])
        child_ids = get_child_ids(block)
        # :237-246 left-semi: ids not in cell_blocks are dropped
        self.common_cells = [
            CommonCell(cell_blocks[i], self, selection_blocks, words)
            for i in child_ids
            if cell_blocks.get(i)
        ]
        self.merged_cells = [
            MergedCell(merged_cell_blocks[i], self)
            for i in child_ids
            if merged_cell_blocks.get(i)
        ]
        self.ordered_lines = [
            l for cell in self.common_cells for l in cell.child_lines
        ]
        # :262-269 — max() raises on a cell-less table (quarantine, §2.8)
        self.rows = max(c.row_index for c in self.common_cells) + 1
        self.columns = max(c.column_index for c in self.common_cells) + 1
        self.parent_layout = None


class Value(_Block):
    __slots__ = ("child_selection_elements", "associated_key",
                 "child_words", "child_lines")

    def __init__(self, block, selection_blocks, words) -> None:  # :424-469
        self._base(block, "textract-value")
        if "VALUE" not in (block.get("EntityTypes") or []):
            raise ValueError("not a VALUE block")
        child_ids = get_child_ids(block)
        self.child_selection_elements = [
            SelectionElement(selection_blocks.get(i), parent_value=self)
            for i in child_ids
            if selection_blocks.get(i)
        ]
        self.associated_key = None
        self.child_words = [w for w in map(words.get, child_ids) if w]
        for word in self.child_words:
            word.parent_value = self
        self.child_lines = []
        _append_first_seen(self.child_lines,
                           (w.parent_line for w in self.child_words))
        for line in self.child_lines:
            line.parent_value = self


class Key(_Block):
    __slots__ = ("child_words", "associated_values", "child_lines")

    def __init__(self, block, values, words) -> None:  # :472-526
        self._base(block, "textract-key")
        if "KEY" not in (block.get("EntityTypes") or []):
            raise ValueError("not a KEY block")
        rels = block.get("Relationships") or []
        associated_value_ids: List[str] = []
        if any(r.get("Type") == "VALUE" for r in rels):
            associated_value_ids = [
                r.get("Ids") or [] for r in rels if r["Type"] == "VALUE"
            ][0]
        # :505-509 — a missing value id yields None -> AttributeError
        self.associated_values = [values.get(i) for i in associated_value_ids]
        for value in self.associated_values:
            value.associated_key = self
        self.child_words = [
            w for w in map(words.get, get_child_ids(block)) if w
        ]
        for word in self.child_words:
            word.parent_key = self
        self.child_lines = []
        _append_first_seen(self.child_lines,
                           (w.parent_line for w in self.child_words))
        for line in self.child_lines:
            line.parent_key = self


class Layout(_Block):
    __slots__ = ("page_layout_type", "textract_layout_type",
                 "child_lines", "child_regions", "parent_layout")

    def __init__(self, block, top_blocks, words, lines) -> None:  # :134-196
        layout_type = block["BlockType"]
        prefix = "textract-" + layout_type.lower().replace("_", "-")  # :165-167
        self._base(block, prefix)
        self.page_layout_type = LAYOUT_TYPE_MAP.get(layout_type, "floating")  # :163
        self.textract_layout_type = layout_type
        child_ids = get_child_ids(block)
        child_words = [w for w in map(words.get, child_ids) if w]
        for word in child_words:
            word.parent_layout = self  # :174-175
        self.child_lines = [x for x in map(lines.get, child_ids) if x]
        # :182-184 — may append a None parent_line
        _append_first_seen(self.child_lines,
                           (w.parent_line for w in child_words))
        for line in self.child_lines:
            line.parent_layout = self  # :186-187
        self.child_regions = [
            b for b in map(top_blocks.get, child_ids) if b
        ]
        self.parent_layout = None


# ---------------------------------------------------------------------------
# reading order — convert_aws.py:634-701

def derive_reading_order(word_list) -> List[object]:
    top: List[object] = []
    seen = set()  # identity-dedup accelerator for the `not in` checks

    def _add(obj) -> None:
        if id(obj) not in seen:
            seen.add(id(obj))
            top.append(obj)

    for word in word_list:
        if word.parent_line:
            line = word.parent_line
            complex_line_parent = next(
                (p for p in [
                    line.parent_cell.parent_table if line.parent_cell else None,
                    line.parent_value,
                    line.parent_key,
                    line.parent_layout,
                ] if p),
                False,
            )
            if complex_line_parent:
                _add(complex_line_parent)
        complex_word_parent = next(
            (p for p in [
                word.parent_cell.parent_table if word.parent_cell else None,
                word.parent_value,
                word.parent_key,
                word.parent_layout,
            ] if p),
            False,
        )
        if complex_word_parent:
            _add(complex_word_parent)
    return top


# ---------------------------------------------------------------------------
# serialization to spans — mirrors instantiate_pagexml (:1001-1199) plus the
# flattening spec (FIXTURES.md §3): pre-order, same field joins.

class _Emitter:
    def __init__(self, w: int, h: int, media_ref: str) -> None:
        self.w = w
        self.h = h
        self.media_ref = media_ref
        self.out: List[List] = []

    def _pts(self, obj) -> str:
        # measured: memoizing this per geometry id costs MORE than the
        # ~30% re-emission recompute it saves — the formatter is cheap
        return points_from_geometry(obj.geometry, self.w, self.h)

    def emit_word(self, word: Word) -> None:  # :1074-1081
        self.out.append([
            "word",
            US.join([self._pts(word), word.text or "", word.text_type or ""]),
            "",
        ])

    def emit_line(self, line: Line) -> None:  # :1061-1072
        self.out.append([
            "line",
            US.join([self._pts(line), line.text or ""]),
            "",
        ])
        for word in line.child_words:
            self.emit_word(word)

    def emit_table(self, table: Table) -> None:  # :1112-1193
        self.out.append([
            "table",
            US.join([self._pts(table), str(table.rows), str(table.columns)]),
            "",
        ])
        visited_merged = []
        for cell in table.common_cells:
            merged = cell.parent_merged_cell
            if merged:
                if merged in visited_merged:  # :1121 — identity dedup
                    continue
                visited_merged.append(merged)
                cell = merged
            self.out.append([
                "cell",
                US.join([
                    self._pts(cell),
                    str(cell.row_index),
                    str(cell.column_index),
                    str(cell.row_span),
                    str(cell.column_span),
                    "true" if cell.column_header else "false",
                ]),
                "",
            ])
            for line in cell.child_lines:  # :1160-1175 full line + all words
                self.emit_line(line)

    def emit_layout(self, layout: Layout) -> None:
        lt = layout.textract_layout_type
        if lt == "LAYOUT_FIGURE":  # :1018-1054
            # ImageRegionType has no `type` attribute — the reference's
            # type_=page_layout_type (:1020) is silently dropped by the
            # serializer (golden XMLs carry no @type on ImageRegion).
            self.out.append([
                "media",
                US.join([self._pts(layout), "",
                         "textract-layout-type: figure;"]),
                self.media_ref,
            ])
            for line in layout.child_lines:
                # dummy text region per line (:1027-1037): no type/custom
                self.out.append([
                    "region",
                    US.join([self._pts(line), "", ""]),
                    "",
                ])
                self.emit_line(line)
            # :1050-1052
            assert len(layout.child_regions) == 0, \
                "unexpected AWS layout recursion in LAYOUT_FIGURE"
            return
        if lt == "LAYOUT_TABLE":  # :1057-1059 — emits nothing
            return
        # :1083-1110
        custom = ""
        if lt != "LAYOUT_DUMMY":  # :1085-1088
            custom = f"textract-layout-type: {lt.split('LAYOUT_')[1].lower()};"
        self.out.append([
            "region",
            US.join([self._pts(layout), layout.page_layout_type, custom]),
            "",
        ])
        for line in layout.child_lines:
            self.emit_line(line)
        for child in layout.child_regions:
            # :1094-1099 — AttributeError on Table/Key/Value children,
            # AssertionError on FIGURE/TABLE recursion, like the reference
            assert child.textract_layout_type.startswith("LAYOUT_") and \
                child.textract_layout_type not in ("LAYOUT_FIGURE", "LAYOUT_TABLE"), \
                "unexpected AWS layout recursion"
            self.emit_layout(child)


# ---------------------------------------------------------------------------
# the engine — convert_aws.py:728-1211 stages 2..8 (§3.3)

class _Model:
    """Stages 2-6 output: everything serialization needs (spans or XML)."""
    __slots__ = ("layouts", "tables", "reading_order")

    def __init__(self, layouts, tables, reading_order) -> None:
        self.layouts = layouts
        self.tables = tables
        self.reading_order = reading_order


def build_model(aws_json: Dict) -> _Model:
    """Stages 2-6 (bucket, link, de-nest, repair, order) of the reference
    pipeline — shared by the span emitter (convert_doc) and the PAGE-XML
    renderer (t2p_spark.render_xml). Raises on every input the reference
    converter would crash on (SURVEY.md §2.8).
    """
    # stage 2: bucket (:753-792)
    page_block = None
    line_blocks: Dict[str, Dict] = {}
    word_blocks: Dict[str, Dict] = {}
    table_blocks: Dict[str, Dict] = {}
    cell_blocks: Dict[str, Dict] = {}
    merged_cell_blocks: Dict[str, Dict] = {}
    selection_blocks: Dict[str, Dict] = {}
    kv_blocks: Dict[str, Dict] = {}
    layout_blocks: Dict[str, Dict] = {}
    block_order: Dict[str, int] = {}
    # dict dispatch replaces the reference's 8 sequential string compares
    # per block (same routing: BlockTypes are mutually exclusive except the
    # LAYOUT_ prefix family; PAGE keeps its exact single-page assert)
    buckets = {
        "LINE": line_blocks, "WORD": word_blocks, "TABLE": table_blocks,
        "CELL": cell_blocks, "MERGED_CELL": merged_cell_blocks,
        "SELECTION_ELEMENT": selection_blocks, "KEY_VALUE_SET": kv_blocks,
    }
    for order, block in enumerate(aws_json["Blocks"]):
        block_order[block["Id"]] = order
        bt = block["BlockType"]
        target = buckets.get(bt)
        if target is not None:
            target[block["Id"]] = block
        elif bt == "PAGE":
            assert page_block is None, "page must not have more than 1 PAGE block"
            page_block = block
        elif bt.startswith("LAYOUT_"):
            layout_blocks[block["Id"]] = block
        # TABLE_TITLE / TABLE_FOOTER blocks are collected but never used by
        # the reference (§2.8.6) — we skip the dead buckets entirely.

    # stage 3: link (:794-841) — construction order defines backref precedence
    words = {i: Word(b) for i, b in word_blocks.items()}
    lines = {i: Line(b, words) for i, b in line_blocks.items()}
    tables = {
        i: Table(b, cell_blocks, merged_cell_blocks, selection_blocks, words)
        for i, b in table_blocks.items()
    }
    values = {
        i: Value(b, selection_blocks, words)
        for i, b in kv_blocks.items()
        if "VALUE" in (b.get("EntityTypes") or [])
    }
    keys = {
        i: Key(b, values, words)
        for i, b in kv_blocks.items()
        if "KEY" in (b.get("EntityTypes") or [])
    }
    top_blocks = dict(layout_blocks)
    top_blocks.update(tables)
    top_blocks.update(keys)
    top_blocks.update(values)
    layouts = {
        i: Layout(b, top_blocks, words, lines) for i, b in layout_blocks.items()
    }

    # stage 4: de-nest recursive layouts, claim tables (:843-864)
    for layout in list(layouts.values()):
        for i, child in enumerate(layout.child_regions):
            if isinstance(child, dict):
                child_id = child["Id"]
                assert child_id in layouts
                layout.child_regions[i] = layouts[child_id]
                layouts[child_id].parent_layout = layout
                del layouts[child_id]
            elif child.id in tables:
                tables[child.id].parent_layout = layout
                del tables[child.id]
            # KEY/VALUE claiming is commented out in the reference (:857-864)

    # stage 5: repair (:866-909)
    for word in words.values():
        if word.parent_line or word.parent_cell or word.parent_layout:
            continue
        # reference crash path :888 (`lines.append` on a dict) — §2.8.1
        raise AttributeError(
            "dangling word (no line/cell/layout parent): reference crash path"
        )
    for line in list(lines.values()):
        if line.parent_cell or line.parent_layout:
            continue
        dummy_block = dict(line_blocks[line.id])  # :902
        dummy_block["Id"] = line.id + "_parent"
        dummy_block["BlockType"] = "LAYOUT_DUMMY"
        dummy = Layout(dummy_block, {}, {}, {})
        dummy.child_lines = [line]
        line.parent_layout = dummy
        block_order[dummy.id] = block_order[line.id]  # :908
        layouts[dummy.id] = dummy

    # stage 6: order (:911-941)
    text_regions = derive_reading_order(words.values())
    if any(layouts):
        layout_regions = sorted(layouts.values(), key=lambda o: block_order[o.id])
        for table in tables.values():  # :920-938 table splice
            layout_pos = -1
            for layout in layout_regions:
                if layout.geometry == table.geometry:
                    layout_pos = layout_regions.index(layout)
                    layout_regions[layout_pos] = table
                    break
            if layout_pos > -1:
                continue
            text_pos = text_regions.index(table)  # ValueError on wordless table (§2.8.3)
            if text_pos > 0:
                layout_pos = layout_regions.index(text_regions[text_pos - 1]) + 1
            else:
                layout_pos = layout_regions.index(text_regions[text_pos + 1]) + 1
            layout_regions = (
                layout_regions[:layout_pos] + [table] + layout_regions[layout_pos:]
            )
        reading_order = layout_regions
    else:
        reading_order = text_regions
        # crash parity (:1148): in word-order mode a table with cells but no
        # words is serialized (:1198) without a reading-order group ->
        # `None.add_RegionRef` AttributeError in the reference.
        in_order = {id(obj) for obj in text_regions}
        for table in tables.values():
            if id(table) not in in_order:
                raise AttributeError(
                    "wordless table in word-order mode: reference crash "
                    "path convert_aws.py:1148"
                )

    return _Model(layouts, tables, reading_order)


def convert_doc(aws_json: Dict, img_width: int, img_height: int,
                media_ref: str = "") -> List[Span]:
    """Convert one parsed Textract response to its ordered span sequence.

    Raises on every input the reference converter would crash on
    (SURVEY.md §2.8) — wrap with :func:`convert_doc_safe` in pipelines.
    """
    model = build_model(aws_json)
    # stages 7+8 fused: emit spans per top-level object, in reading order.
    # (The reference writes region XML in construction order and reorders via
    # ReadingOrder; flatten_page_xml re-sorts to reading order — FIXTURES.md §3.)
    emitter = _Emitter(img_width, img_height, media_ref)
    for obj in model.reading_order:
        if isinstance(obj, Table):
            # word-order mode crash parity: a serialized table outside the
            # reading order never happens; a table *in* reading order always
            # has its local group (:967-976), so emission is total here.
            emitter.emit_table(obj)
        elif isinstance(obj, Layout):
            emitter.emit_layout(obj)
        # Key/Value top-level entries are reading-order-only in the reference
        # (never serialized, §2.8.2) -> dangling regionRef -> no spans.

    return [(k, t, m, i) for i, (k, t, m) in enumerate(emitter.out)]


def convert_doc_safe(aws_json, img_width, img_height, media_ref=""):
    """(status, spans, error) — quarantine instead of crash.

    status: 'ok' | 'quarantined'. Quarantined docs carry an empty span list
    and the reference crash reason (SURVEY.md §2.8 policy).
    """
    try:
        return "ok", convert_doc(aws_json, img_width, img_height, media_ref), ""
    except Exception as exc:  # noqa: BLE001 — reference crash paths are data-dependent
        return "quarantined", [], f"{type(exc).__name__}: {exc}"
