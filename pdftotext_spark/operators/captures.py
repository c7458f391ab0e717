"""Positional captures over the fragments table (SURVEY.md §2.7,
L5–L10) — the reference's rectangle/lines capture API re-expressed as
DataFrame operators.

Reference semantics (PdfToText.php citations):
- rectangle capture: fragments whose bbox is contained in a named
  area, concatenated per page with bbox union (11070–11123; Contains
  at 11896–11902);
- lines capture: a column grid tiled down the page assigns fragments
  to (line, column) cells (11274–11393);
- capture definitions come from an XML file (10602–10663) — parsed
  driver-side with stdlib ElementTree into plain dicts, broadcast
  implicitly as literals in the plan;
- page-range algebra ``"1, $-9..$"`` with ``$`` = page count
  (11439–11702) — the reference evals range arithmetic
  (``PdfToText.php:11695``!); ours is a safe parser.

The containment filter + groupBy is whole-stage-codegen'd; the areas
side is tiny and enters the plan as literal predicates (rectangle) or
a broadcast grid (lines), so at scale this is a map-side operation —
no shuffle beyond the final per-(page, shape) aggregation.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CaptureArea:
    """Rectangle in PDF coordinates (origin bottom-left; top > bottom).
    Mirrors the reference area model (PdfToText.php:11713–11903)."""

    name: str
    left: float
    top: float
    right: float
    bottom: float
    pages: str = "1..$"  # page-range expression (default: every page)


@dataclass(frozen=True)
class LinesCapture:
    """Tiled line/column capture (PdfToText.php:11274–11311)."""

    name: str
    top: float
    height: float  # per-line height used to tile downward
    count: int  # number of lines
    columns: tuple[tuple[str, float, float], ...]  # (col name, left, right)
    pages: str = "1..$"


# --------------------------------------------------- page-range algebra


def parse_page_range(expr: str, page_count: int) -> set[int]:
    """Safe evaluation of the reference's page-set syntax
    (``"1, 3..5, $-1..$"``, ``$`` = page count; PdfToText.php:11439–11702
    uses eval — we parse ±constant arithmetic only)."""

    def value(tok: str) -> int:
        tok = tok.strip()
        m = re.fullmatch(r"\$\s*(?:(-|\+)\s*(\d+))?", tok)
        if m:
            v = page_count
            if m.group(1):
                v = v - int(m.group(2)) if m.group(1) == "-" else v + int(m.group(2))
            return v
        if re.fullmatch(r"\d+", tok):
            return int(tok)
        raise ValueError(f"bad page expression: {tok!r}")

    pages: set[int] = set()
    for part in expr.split(","):
        part = part.strip()
        if not part:
            continue
        if ".." in part:
            lo, hi = part.split("..", 1)
            pages.update(range(value(lo), value(hi) + 1))
        else:
            pages.add(value(part))
    return {p for p in pages if 1 <= p <= page_count}


def _parse_bound(tok: str) -> tuple[str, int]:
    """A range bound is either ('abs', n) or ('rel', offset-from-$)."""
    tok = tok.strip()
    m = re.fullmatch(r"\$\s*(?:(-|\+)\s*(\d+))?", tok)
    if m:
        off = int(m.group(2) or 0)
        return ("rel", -off if m.group(1) == "-" else off)
    if re.fullmatch(r"\d+", tok):
        return ("abs", int(tok))
    raise ValueError(f"bad page expression: {tok!r}")


def page_range_predicate(expr: str, page_col, max_page_col):
    """DataFrame-native page-set predicate: builds a boolean Column
    from the reference's page syntax, resolving ``$`` against a
    per-document ``max_page`` column (so one plan serves documents of
    any page count — no driver-side expansion)."""
    def bound_col(kind: str, v: int):
        return F.lit(v) if kind == "abs" else max_page_col + F.lit(v)

    pred = F.lit(False)
    for part in expr.split(","):
        part = part.strip()
        if not part:
            continue
        if ".." in part:
            lo_t, hi_t = part.split("..", 1)
            lo_k, lo_v = _parse_bound(lo_t)
            hi_k, hi_v = _parse_bound(hi_t)
            pred = pred | (
                (page_col >= bound_col(lo_k, lo_v))
                & (page_col <= bound_col(hi_k, hi_v))
            )
        else:
            k, v = _parse_bound(part)
            pred = pred | (page_col == bound_col(k, v))
    return pred


# ------------------------------------------------------- XML definitions


def _rect_bounds(a: dict) -> tuple[float, float, float, float]:
    left = float(a["left"])
    top = float(a["top"])
    right = float(a["right"]) if "right" in a else left + float(a["width"]) - 1
    bottom = float(a["bottom"]) if "bottom" in a else top - float(a["height"]) + 1
    return left, top, right, bottom


def parse_capture_xml(xml_text: str) -> tuple[list[CaptureArea], list[LinesCapture]]:
    """Parse a capture-definition XML (L10).

    Supports both the reference's nested per-page format
    (``<rectangle name="Title"><page number="1" left=.. right=..
    top=.. bottom=../></rectangle>`` and ``<lines><page number="2..$"
    top=.. height=.. bottom=../><column name=.. left=.. width=../>
    </lines>`` — examples/text-capture/sample-report.xml) and a flat
    attribute form (coords directly on the shape element)."""
    xml_text = xml_text.lstrip("﻿")
    root = ET.fromstring(xml_text)
    rects: list[CaptureArea] = []
    lines: list[LinesCapture] = []
    for el in root:
        tag = el.tag.lower()
        if tag == "rectangle":
            name = el.attrib["name"]
            page_children = [c for c in el if c.tag.lower() == "page"]
            if page_children:
                for pc in page_children:
                    left, top, right, bottom = _rect_bounds(pc.attrib)
                    rects.append(
                        CaptureArea(
                            name, left, top, right, bottom,
                            pc.attrib.get("number", "$"),
                        )
                    )
            else:
                left, top, right, bottom = _rect_bounds(el.attrib)
                rects.append(
                    CaptureArea(name, left, top, right, bottom, el.attrib.get("pages", "$"))
                )
        elif tag == "lines":
            name = el.attrib["name"]
            cols = tuple(
                (
                    c.attrib["name"],
                    float(c.attrib["left"]),
                    float(c.attrib["right"])
                    if "right" in c.attrib
                    else float(c.attrib["left"]) + float(c.attrib["width"]) - 1,
                )
                for c in el
                if c.tag.lower() == "column"
            )
            page_children = [c for c in el if c.tag.lower() == "page"]
            if page_children:
                for pc in page_children:
                    top = float(pc.attrib["top"])
                    height = float(pc.attrib["height"])
                    bottom = float(pc.attrib.get("bottom", 0.0))
                    count = max(1, int((top - bottom) / height))
                    lines.append(
                        LinesCapture(
                            name, top, height, count, cols,
                            pc.attrib.get("number", "$"),
                        )
                    )
            else:
                a = el.attrib
                lines.append(
                    LinesCapture(
                        name,
                        float(a["top"]),
                        float(a["height"]),
                        int(a["count"]),
                        cols,
                        a.get("pages", "$"),
                    )
                )
    return rects, lines


# ----------------------------------------------------- rectangle capture


def rectangle_capture(
    fragments: DataFrame, areas: list[CaptureArea], separator: str = " "
) -> DataFrame:
    """L5: containment filter + per-(doc, page, shape) ordered concat
    and bbox union (min/max aggregation).

    Containment matches the reference: the fragment's box
    ``[x, x+width] × [y, y+font_height]`` must lie inside the area
    (PdfToText.php:11896–11902). Fragment order inside a capture is
    reading order: (y desc, x asc, seq) (11088–11103).
    """
    from pyspark.sql import Window

    area_rows = [
        (a.name, float(a.left), float(a.top), float(a.right), float(a.bottom))
        for a in areas
    ]
    spark = fragments.sparkSession
    areas_df = spark.createDataFrame(
        area_rows, "shape string, a_left double, a_top double, a_right double, a_bottom double"
    )
    # per-document page count resolves $-relative page ranges
    f = fragments.withColumn(
        "max_page",
        F.max("page").over(Window.partitionBy("conv_id", "turn_idx")),
    )
    joined = f.join(
        F.broadcast(areas_df),
        (F.col("x") >= F.col("a_left"))
        & (F.col("x") + F.col("width") <= F.col("a_right"))
        & (F.col("y") >= F.col("a_bottom"))
        & (F.col("y") + F.col("font_height") <= F.col("a_top")),
    )
    # per-shape page-range filter (each area's `pages` expression)
    page_pred = F.lit(False)
    for a in areas:
        page_pred = page_pred | (
            (F.col("shape") == a.name)
            & page_range_predicate(a.pages, F.col("page"), F.col("max_page"))
        )
    joined = joined.filter(page_pred)
    return (
        joined.groupBy("conv_id", "turn_idx", "page", "shape")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            # sort key: reading order (y desc → negate)
                            F.struct(
                                (-F.col("y")).alias("ny"),
                                F.col("x"),
                                F.col("seq"),
                                F.col("text"),
                            )
                        )
                    ),
                    lambda s: s.text,
                ),
                separator,
            ).alias("captured_text"),
            F.min("x").alias("bbox_left"),
            F.max(F.col("x") + F.col("width")).alias("bbox_right"),
            F.min("y").alias("bbox_bottom"),
            F.max(F.col("y") + F.col("font_height")).alias("bbox_top"),
            F.count("*").cast("long").alias("n_fragments"),
        )
    )


# ---------------------------------------------------------- lines capture


def lines_capture(fragments: DataFrame, cap: LinesCapture) -> DataFrame:
    """L6: tile ``count`` line bands of ``height`` downward from
    ``top``; cross with the column ranges (a generated tiny grid,
    broadcast); assign fragments by containment; aggregate per
    (line, column) cell."""
    spark = fragments.sparkSession
    grid_rows = []
    for line_no in range(cap.count):
        band_top = cap.top - line_no * cap.height
        band_bottom = band_top - cap.height
        for col_name, left, right in cap.columns:
            grid_rows.append(
                (line_no, col_name, float(left), float(right),
                 float(band_top), float(band_bottom))
            )
    grid = spark.createDataFrame(
        grid_rows,
        "line_no int, column_name string, c_left double, c_right double, "
        "band_top double, band_bottom double",
    )
    from pyspark.sql import Window

    f = fragments.withColumn(
        "max_page",
        F.max("page").over(Window.partitionBy("conv_id", "turn_idx")),
    ).filter(page_range_predicate(cap.pages, F.col("page"), F.col("max_page")))
    joined = f.join(
        F.broadcast(grid),
        (F.col("x") >= F.col("c_left"))
        & (F.col("x") <= F.col("c_right"))
        & (F.col("y") > F.col("band_bottom"))
        & (F.col("y") <= F.col("band_top")),
    )
    return (
        joined.groupBy("conv_id", "turn_idx", "page", "line_no", "column_name")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("x", "seq", "text"))
                    ),
                    lambda s: s.text,
                ),
                " ",
            ).alias("cell_text")
        )
        .withColumn("capture_name", F.lit(cap.name))
    )


def captures_projection(rect_captured: DataFrame) -> DataFrame:
    """L9 ``ToCaptures()`` reshape: one row per (doc, shape) with a
    page→text map (map_from_entries over collected pairs)."""
    return (
        rect_captured.groupBy("conv_id", "turn_idx", "shape")
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct("page", "captured_text"))
                )
            ).alias("pages_map"),
            F.count("*").cast("long").alias("n_pages_hit"),
        )
    )
