"""HTML table source (SURVEY S4).

The reference drives a Selenium browser through a login flow, locates a
``<table>`` element, reads every ``td`` into a pandas frame, transposes it
(attribute rows x city columns -> one row per city), types the columns and
upserts on (city, publish_date) — tasks/mysteel/web_crawler.py:24-118.

The browser/login half is an out-of-engine collector: it belongs in a
landing zone writer, not in a distributed engine (SURVEY §2.1/S4).  This
module implements everything after the fetch, Spark-first:

- ``read_html_tables`` — ``binaryFile`` scan of landing-zone ``*.html`` +
  a stdlib-``html.parser`` extractor inside ``mapInPandas`` (no lxml/bs4 in
  the container, and none needed for machine-written pages).  Output is the
  long form (path, table_idx, row_idx, col_idx, cell) so that downstream
  shaping is Catalyst pivots, not driver pandas.
- ``transpose_table`` — the reference's ``df.head(6).T.tail(n-1)`` move as
  a distributed pivot: pick attribute rows, drop the label column, group by
  source column ordinal, pivot attribute position.  One shuffle, scales
  with cities x files.
- ``extract_attr_texts`` — page-level scalars (the ``id="publishtime"``
  date the reference reads via find_element_by_id) captured per file.
- ``mysteel_hrb400`` — the two product frames (12mm / 20mm) with the
  reference's exact row splits, typed like its dtype list (DOUBLE prices,
  Date publish_date), ready for ``write_upsert`` on (city, publish_date).
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class _TableExtract(HTMLParser):
    """Collect every <table> as rows of cell texts, plus id->text map."""

    _VOID = {"br", "img", "hr", "input", "meta", "link", "col", "area",
             "base", "embed", "source", "track", "wbr"}

    # HTML5 implied-end rules (the subset dirty vendor pages actually hit):
    # a start tag on the LEFT implicitly closes any currently-open element
    # in the set on the RIGHT. The while-loop pop naturally stops at a
    # <table> boundary (table is never in a closing set), so a nested
    # table inside a td never closes the outer cell.
    _IMPLIED = {
        "p": {"p"}, "li": {"li"},
        "tr": {"tr", "td", "th"}, "td": {"td", "th"}, "th": {"td", "th"},
        "thead": {"tr", "td", "th"}, "tbody": {"tr", "td", "th"},
        "tfoot": {"tr", "td", "th"},
        "option": {"option"}, "dd": {"dd", "dt"}, "dt": {"dd", "dt"},
    }

    def __init__(self) -> None:
        super().__init__()
        self.tables: list[list[list[str]]] = []
        self.id_texts: dict[str, str] = {}
        # per-table frames [rows, open_row, open_cell] — a STACK, so a
        # table nested inside a td never clobbers the outer table's
        # in-flight row/cell (single-slot row/cell state dropped the
        # outer cell's remaining columns)
        self._tstack: list[list] = []
        # one TRUE open-element stack (non-void tags). Captures record the
        # stack depth their element sits at and close exactly when the
        # stack shrinks past it — so a nested <b> never pops a capture
        # early, AND an unclosed <p>/<li>/<tr>/<td> (HTML5 implied end)
        # never inflates a counter forever and silently swallows the id
        # text, which the old per-capture depth counters did on dirty
        # vendor pages.
        self._stack: list[str] = []
        self._id_capture: list[list] = []  # [id, buf, depth_at_push]

    def _pop_top(self) -> None:
        """Close the topmost open element (explicit, implied, or EOF)."""
        tag = self._stack.pop()
        depth = len(self._stack)
        while self._id_capture and self._id_capture[-1][2] > depth:
            cid, buf, _ = self._id_capture.pop()
            self.id_texts.setdefault(cid, "".join(buf).strip())
        frame = self._tstack[-1] if self._tstack else None
        if tag in ("td", "th") and frame is not None \
                and frame[2] is not None and frame[1] is not None:
            frame[1].append("".join(frame[2]).strip())
            frame[2] = None
        elif tag == "tr" and frame is not None and frame[1] is not None:
            frame[0].append(frame[1])
            frame[1] = None
        elif tag == "table" and frame is not None:
            self.tables.append(frame[0])
            self._tstack.pop()

    def handle_starttag(self, tag, attrs):
        if tag in self._VOID:
            return  # renders no end tag: invisible to element structure
        implied = self._IMPLIED.get(tag)
        if implied:
            while self._stack and self._stack[-1] in implied:
                self._pop_top()
        if tag == "table":
            self._tstack.append([[], None, None])
        elif tag == "tr" and self._tstack:
            self._tstack[-1][1] = []
        elif tag in ("td", "th") and self._tstack \
                and self._tstack[-1][1] is not None:
            self._tstack[-1][2] = []
        self._stack.append(tag)
        attr_id = dict(attrs).get("id")
        if attr_id:
            self._id_capture.append([attr_id, [], len(self._stack)])

    def handle_endtag(self, tag):
        if tag in self._VOID or tag not in self._stack:
            return  # stray end tag on a dirty page: ignore
        # implicitly close unclosed children first (</ul> with open <li>)
        while self._stack and self._stack[-1] != tag:
            self._pop_top()
        if self._stack:
            self._pop_top()

    def handle_data(self, data):
        if self._tstack and self._tstack[-1][2] is not None:
            self._tstack[-1][2].append(data)
        for _, buf, _depth in self._id_capture:
            buf.append(data)

    def close(self):
        # EOF flush: a truncated page (or implied ends never materialised)
        # must still surface captured ids and any open table structure
        while self._stack:
            self._pop_top()
        super().close()


def parse_html(text: str) -> _TableExtract:
    p = _TableExtract()
    p.feed(text)
    p.close()
    return p


_CELLS_SCHEMA = ("path string, table_idx int, row_idx int, col_idx int, "
                 "cell string")
_ATTR_SCHEMA = "path string, attr_id string, text string"


def read_html_tables(spark: SparkSession, path_glob: str,
                     encoding: str = "utf-8") -> DataFrame:
    """Landing-zone HTML -> long (path, table_idx, row_idx, col_idx, cell).

    binaryFile keeps whole pages together per task; parsing fans out across
    executors (one page is one pandas row, many pages per batch).
    """
    files = spark.read.format("binaryFile").load(path_glob) \
        .select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                parsed = parse_html(bytes(content).decode(encoding, "replace"))
                for t, table in enumerate(parsed.tables):
                    for r, row in enumerate(table):
                        for c, cell in enumerate(row):
                            rows.append((path, t, r, c, cell))
            if rows:
                yield pd.DataFrame(rows, columns=["path", "table_idx",
                                                  "row_idx", "col_idx",
                                                  "cell"])

    return files.mapInPandas(run, _CELLS_SCHEMA)


def extract_attr_texts(spark: SparkSession, path_glob: str,
                       encoding: str = "utf-8") -> DataFrame:
    """Per-file id->text scalars (e.g. the publishtime span)."""
    files = spark.read.format("binaryFile").load(path_glob) \
        .select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                parsed = parse_html(bytes(content).decode(encoding, "replace"))
                rows.extend((path, k, v) for k, v in parsed.id_texts.items())
            if rows:
                yield pd.DataFrame(rows, columns=["path", "attr_id", "text"])

    return files.mapInPandas(run, _ATTR_SCHEMA)


def transpose_table(cells: DataFrame, row_indices: list[int],
                    names: list[str], table_idx: int = 0,
                    drop_label_col: bool = True) -> DataFrame:
    """Attribute-rows x entity-columns -> one row per entity column.

    The reference's ``df.head(6).T.tail(df.shape[1]-1)`` with
    ``row_indices`` selecting which attribute rows survive (its df1 takes
    rows 0-5; df2 takes row 0 + the last 5) and ``names`` naming them in
    order.  Pivot values are the closed ``names`` list, so the plan is a
    single hash aggregate — no pivot-discovery job.
    """
    if len(row_indices) != len(names):
        raise ValueError("row_indices and names must align")
    attr = F.create_map(*[x for ri, n in zip(row_indices, names)
                          for x in (F.lit(ri), F.lit(n))])
    sel = cells.where((F.col("table_idx") == table_idx)
                      & F.col("row_idx").isin(row_indices))
    if drop_label_col:
        sel = sel.where(F.col("col_idx") > 0)
    long = sel.select("path", "col_idx",
                      attr[F.col("row_idx")].alias("attr"), "cell")
    return (long.groupBy("path", "col_idx")
            .pivot("attr", names)
            .agg(F.first("cell")))


# the reference's attribute order: row 0 = city, rows 1-5 / last 5 = the
# per-product metrics (web_crawler.py:73-81)
_MYSTEEL_NAMES = ["city", "price", "growth_rate", "producer",
                  "wighting_mode", "price_avg_30d"]
_MYSTEEL_CASTS = {"price": "double", "growth_rate": "double",
                  "price_avg_30d": "double"}


def _typed(frame: DataFrame, publish: DataFrame) -> DataFrame:
    for col, typ in _MYSTEEL_CASTS.items():
        frame = frame.withColumn(col, F.col(col).cast(typ))
    return (frame.join(F.broadcast(publish), "path", "left")
            .select(*_MYSTEEL_NAMES, "publish_date")
            .orderBy("city"))


def mysteel_hrb400(spark: SparkSession, path_glob: str,
                   n_rows: int = 11) -> tuple[DataFrame, DataFrame]:
    """The two product frames (12mm rows 0-5, 20mm row 0 + last 5), typed.

    ``n_rows`` is the attribute-row count of the scraped table (the
    reference hard-codes head(6)/tail(5) over an 11-row table).  Upsert the
    results with ``operators.upsert.write_upsert(..., keys=["city",
    "publish_date"])`` to get the reference's ON DUPLICATE KEY semantics.
    """
    cells = read_html_tables(spark, path_glob)
    publish = (extract_attr_texts(spark, path_glob)
               .where(F.col("attr_id") == "publishtime")
               .select("path",
                       F.to_date(F.split("text", " ").getItem(0))
                       .alias("publish_date")))
    mm12 = transpose_table(cells, list(range(6)), _MYSTEEL_NAMES)
    mm20 = transpose_table(cells, [0] + list(range(n_rows - 5, n_rows)),
                           _MYSTEEL_NAMES)
    return _typed(mm12, publish), _typed(mm20, publish)
