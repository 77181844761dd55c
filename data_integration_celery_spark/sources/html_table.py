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

    def __init__(self) -> None:
        super().__init__()
        self.tables: list[list[list[str]]] = []
        self.id_texts: dict[str, str] = {}
        self._tstack: list[list[list[str]]] = []
        self._row: list[str] | None = None
        self._cell: list[str] | None = None
        # open id captures as [id, buf, depth]: depth = currently-open
        # elements strictly inside the captured element, so a capture only
        # closes on ITS OWN end tag — a nested <b> inside
        # <span id="publishtime"> no longer pops the capture early and
        # truncates/mis-scopes the text
        self._id_capture: list[list] = []

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self._tstack.append([])
        elif tag == "tr" and self._tstack:
            self._row = []
        elif tag in ("td", "th") and self._row is not None:
            self._cell = []
        if tag in self._VOID:
            return  # no end tag ever comes: must not affect capture depth
        for cap in self._id_capture:
            cap[2] += 1
        attr_id = dict(attrs).get("id")
        if attr_id:
            self._id_capture.append([attr_id, [], 0])

    def handle_endtag(self, tag):
        if tag in ("td", "th") and self._cell is not None:
            assert self._row is not None
            self._row.append("".join(self._cell).strip())
            self._cell = None
        elif tag == "tr" and self._row is not None:
            self._tstack[-1].append(self._row)
            self._row = None
        elif tag == "table" and self._tstack:
            self.tables.append(self._tstack.pop())
        if tag in self._VOID or not self._id_capture:
            return
        top = self._id_capture[-1]
        if top[2] == 0:
            # this end tag closes the captured element itself
            self._id_capture.pop()
            self.id_texts.setdefault(top[0], "".join(top[1]).strip())
            rest = self._id_capture
        else:
            top[2] -= 1
            rest = self._id_capture[:-1]
        # the closed element was also nested inside every outer capture
        for cap in rest:
            cap[2] -= 1

    def handle_data(self, data):
        if self._cell is not None:
            self._cell.append(data)
        for _, buf, _depth in self._id_capture:
            buf.append(data)


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
