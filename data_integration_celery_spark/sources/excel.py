"""Excel (.xlsx) source — SURVEY S5.

Reference ingest path: ``pd.read_excel`` of vendor bar exports
(/root/reference tasks/wind/handle_csv/merge_2_n_bar.py:28-33). This
container has no openpyxl/xlrd, so the parser here reads the OOXML package
directly with the stdlib (an .xlsx file is a zip of XML parts — ECMA-376):
``xl/workbook.xml`` names the sheets, ``xl/_rels/workbook.xml.rels`` maps
them to ``xl/worksheets/sheetN.xml``, and cells resolve against
``xl/sharedStrings.xml`` when typed ``s``.

Spark integration is the same shape as every other binary source: a
``binaryFile`` scan fans the files across executors and ``mapInPandas``
parses each one — one task per file, no driver-side reads, so a directory
of thousands of vendor exports ingests in parallel.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 … (base-26 with no zero digit)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _cell_value(cell, shared: list[str], bad_cells: list[str] | None = None):
    t = cell.get("t", "n")
    v_el = cell.find(f"{_NS}v")
    if t == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        t_el = is_el.find(f"{_NS}t") if is_el is not None else None
        return t_el.text if t_el is not None else None
    if v_el is None or v_el.text is None:
        return None
    if t == "s":
        return shared[int(v_el.text)]
    if t in ("str", "d", "e"):
        # 'd' is an ISO-8601 date string, 'e' a formula error literal
        # ('#DIV/0!'): both are text — falling through to float() would
        # abort the whole ingest job on one bad cell in one file
        return v_el.text
    if t == "b":
        return v_el.text == "1"
    try:
        return float(v_el.text)
    except ValueError:
        # malformed numeric cell: NULL the cell, never return the raw text
        # (one stray string silently widened the whole column to mixed
        # object dtype downstream) and never fail the Spark task (one bad
        # cell would abort every file in the batch). The cell ref lands in
        # bad_cells so the ingest can count/quarantine the file.
        if bad_cells is not None:
            bad_cells.append(cell.get("r", "?"))
        return None


def parse_xlsx(content: bytes, sheet: int | str = 0,
               header: bool = True) -> pd.DataFrame:
    """Parse one .xlsx payload into a pandas DataFrame (stdlib only).

    ``sheet`` selects by position (int) or by sheet name (str). With
    ``header`` the first non-empty row provides column names; otherwise
    columns are c0..cN. Missing cells are None (ragged rows padded).
    Malformed numeric cells parse as None; their cell refs are recorded in
    ``df.attrs['malformed_numeric_cells']`` so callers can quarantine the
    file instead of silently losing values.
    """
    zf = zipfile.ZipFile(io.BytesIO(content))
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {r.get("Id"): r.get("Target")
                     for r in rels.findall(f"{_REL_NS}Relationship")}
    rid_attr = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
                "relationships}id")
    sheets = [(s.get("name"), rid_to_target[s.get(rid_attr)])
              for s in wb.find(f"{_NS}sheets").findall(f"{_NS}sheet")]
    if isinstance(sheet, str):
        target = dict(sheets)[sheet]
    else:
        target = sheets[sheet][1]
    if not target.startswith("xl/"):
        target = "xl/" + target.lstrip("/")

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in sst.findall(f"{_NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

    ws = ET.fromstring(zf.read(target))
    rows: list[dict[int, object]] = []
    bad_cells: list[str] = []
    for row in ws.iter(f"{_NS}row"):
        vals: dict[int, object] = {}
        pos = 0  # @r is OPTIONAL in OOXML: unreferenced cells are implied
        for cell in row.findall(f"{_NS}c"):
            m = _CELL_REF.match(cell.get("r", ""))
            idx = _col_index(m.group(1)) if m else pos
            vals[idx] = _cell_value(cell, shared, bad_cells)
            pos = idx + 1
        rows.append(vals)
    if not rows or not any(rows):
        # the documented attrs contract holds on the empty-sheet path too —
        # callers indexing attrs['malformed_numeric_cells'] must not KeyError
        empty = pd.DataFrame()
        empty.attrs["malformed_numeric_cells"] = bad_cells
        return empty
    width = max(max(r) for r in rows if r) + 1
    table = [[r.get(i) for i in range(width)] for r in rows]
    if header:
        cols = [str(c) if c is not None else f"c{i}"
                for i, c in enumerate(table[0])]
        out = pd.DataFrame(table[1:], columns=cols)
    else:
        out = pd.DataFrame(table, columns=[f"c{i}" for i in range(width)])
    out.attrs["malformed_numeric_cells"] = bad_cells
    return out


def read_excel(spark: SparkSession, path_glob: str, out_schema: str,
               sheet: int | str = 0, header: bool = True,
               rename: dict[str, str] | None = None,
               bad_cells_col: str | None = None) -> DataFrame:
    """Distributed .xlsx ingest: binaryFile scan → per-file stdlib parse.

    ``out_schema`` is the Spark DDL of the result; ``rename`` maps vendor
    column headers (e.g. the reference's Chinese captions) onto engine names
    before schema projection. Columns in ``out_schema`` missing from a file
    come back null; extra vendor columns are dropped.

    ``bad_cells_col`` surfaces parse_xlsx's malformed-numeric-cell refs
    through the Spark boundary (pandas ``attrs`` do not survive Arrow):
    when set, every output row additionally carries that file's bad-cell
    refs as an ``array<string>`` column of that name, so distributed
    quarantine (`WHERE size(col) > 0`) works without a second parse pass.
    Without it the refs are dropped, matching the historical behavior.
    """
    from pyspark.sql.types import StructType

    want = [f.name for f in StructType.fromDDL(out_schema).fields]
    files = (spark.read.format("binaryFile").load(path_glob)
             .select("path", "content"))
    full_schema = out_schema
    if bad_cells_col is not None:
        if bad_cells_col in want:
            raise ValueError(
                f"bad_cells_col {bad_cells_col!r} collides with out_schema")
        full_schema = f"{out_schema}, {bad_cells_col} array<string>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                frame = parse_xlsx(bytes(content), sheet=sheet, header=header)
                bad = frame.attrs["malformed_numeric_cells"]
                if rename:
                    frame = frame.rename(columns=rename)
                for c in want:
                    if c not in frame.columns:
                        frame[c] = None
                frame = frame[want]
                if bad_cells_col is not None:
                    frame = frame.assign(**{bad_cells_col: [bad] * len(frame)})
                yield frame

    return files.mapInPandas(run, full_schema)


def write_xlsx(path: str, frame: pd.DataFrame) -> None:
    """Minimal .xlsx writer (inline strings / numbers) — test-fixture tool so
    the reader is exercised against real OOXML zip structure without any
    spreadsheet library in the container."""
    def esc(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                 .replace(">", "&gt;"))

    def ref(r: int, c: int) -> str:
        letters = ""
        c += 1
        while c:
            c, rem = divmod(c - 1, 26)
            letters = chr(65 + rem) + letters
        return f"{letters}{r + 1}"

    def cell(r: int, c: int, v) -> str:
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return ""
        if isinstance(v, (int, float)):
            return f'<c r="{ref(r, c)}"><v>{v}</v></c>'
        return (f'<c r="{ref(r, c)}" t="inlineStr"><is><t>{esc(str(v))}</t>'
                f"</is></c>")

    body = []
    header_cells = "".join(cell(0, i, col)
                           for i, col in enumerate(frame.columns))
    body.append(f'<row r="1">{header_cells}</row>')
    for i, (_, row) in enumerate(frame.iterrows(), start=1):
        cells = "".join(cell(i, j, v) for j, v in enumerate(row))
        body.append(f'<row r="{i + 1}">{cells}</row>')
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(body) + "</sheetData></worksheet>")
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships"><sheets>'
        '<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>')
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>')
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/officeDocument"'
        ' Target="xl/workbook.xml"/></Relationships>')
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types"><Default Extension="rels" ContentType="application/'
        'vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/></Types>')
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
