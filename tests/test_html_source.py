"""S4 HTML table source — landing-zone parse, transpose, typed upsert.

Fixture pages mirror the mysteel layout the reference scrapes
(tasks/mysteel/web_crawler.py:60-89): an 11-attribute-row table whose
columns are cities (row 0 = city names, rows 1-5 = 12mm metrics, rows
6-10 = 20mm metrics) plus an ``id="publishtime"`` span.  The Selenium
fetch/login itself is the out-of-engine collector; these tests cover the
whole in-engine path it feeds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_celery_spark.operators import upsert
from data_integration_celery_spark.sources import html_table


def _page(date_str: str, cities: list[str], base: float) -> str:
    def tr(label, cells):
        tds = "".join(f"<td>{c}</td>" for c in [label] + cells)
        return f"<tr>{tds}</tr>"

    n = len(cities)
    rows = [tr("城市", cities)]
    for i, metric in enumerate(["价格", "涨跌", "厂家", "计重", "30日均价"]):
        if metric in ("厂家", "计重"):
            rows.append(tr(metric, [f"p{j}" for j in range(n)]))
        else:
            rows.append(tr(metric, [f"{base + 10 * i + j:.1f}"
                                    for j in range(n)]))
    for i, metric in enumerate(["价格20", "涨跌20", "厂家20", "计重20",
                                "30日均价20"]):
        if "厂家" in metric or "计重" in metric:
            rows.append(tr(metric, [f"q{j}" for j in range(n)]))
        else:
            rows.append(tr(metric, [f"{base + 100 + 10 * i + j:.1f}"
                                    for j in range(n)]))
    table = "<table><tbody>" + "".join(rows) + "</tbody></table>"
    return ("<html><body><div id=\"publishtime\">"
            f"{date_str} 10:30:00</div>{table}</body></html>")


def _write_pages(tmp_path):
    (tmp_path / "d1.html").write_text(
        _page("2023-05-08", ["shanghai", "beijing", "guangzhou"], 4000.0),
        encoding="utf-8")
    (tmp_path / "d2.html").write_text(
        _page("2023-05-09", ["shanghai", "beijing", "guangzhou"], 4010.0),
        encoding="utf-8")
    return str(tmp_path / "*.html")


def test_parse_html_tables_long_form(spark, tmp_path):
    glob = _write_pages(tmp_path)
    cells = html_table.read_html_tables(spark, glob)
    # 2 files x 11 rows x 4 cols (label + 3 cities)
    assert cells.count() == 2 * 11 * 4
    first = cells.where((F.col("row_idx") == 0) & (F.col("col_idx") == 1)) \
        .select("cell").distinct().collect()
    assert {r.cell for r in first} == {"shanghai"}


def test_publishtime_extraction(spark, tmp_path):
    glob = _write_pages(tmp_path)
    attrs = html_table.extract_attr_texts(spark, glob)
    texts = sorted(r.text for r in attrs
                   .where(F.col("attr_id") == "publishtime").collect())
    assert texts == ["2023-05-08 10:30:00", "2023-05-09 10:30:00"]


def test_mysteel_transpose_and_types(spark, tmp_path):
    glob = _write_pages(tmp_path)
    mm12, mm20 = html_table.mysteel_hrb400(spark, glob)
    p12 = mm12.toPandas()
    assert list(p12.columns) == ["city", "price", "growth_rate", "producer",
                                 "wighting_mode", "price_avg_30d",
                                 "publish_date"]
    assert len(p12) == 6  # 3 cities x 2 days
    d1 = p12[p12["publish_date"].astype(str) == "2023-05-08"] \
        .sort_values("city")
    assert d1["city"].tolist() == ["beijing", "guangzhou", "shanghai"]
    # row 1 is the 12mm price row (metric i=0): base + city_ordinal
    assert d1["price"].tolist() == [4001.0, 4002.0, 4000.0]
    assert str(p12["price"].dtype) == "float64"
    # 20mm price is row 6 (metric i=0 of the second block): base + 100 + j
    p20 = mm20.toPandas()
    d2 = p20[p20["publish_date"].astype(str) == "2023-05-09"] \
        .sort_values("city")
    assert d2["price"].tolist() == [4111.0, 4112.0, 4110.0]
    assert d2["producer"].tolist() == ["q1", "q2", "q0"]


def test_scrape_upsert_on_city_publish_date(spark, tmp_path):
    glob = _write_pages(tmp_path)
    mm12, _ = html_table.mysteel_hrb400(spark, glob)
    target = str(tmp_path / "mysteel_hrb400_12mm")
    upsert.write_upsert(spark, mm12, target, keys=["city", "publish_date"])
    # re-scrape with a revised day-2 page: last write wins per PK
    (tmp_path / "d2.html").write_text(
        _page("2023-05-09", ["shanghai", "beijing", "guangzhou"], 5000.0),
        encoding="utf-8")
    mm12b, _ = html_table.mysteel_hrb400(spark, str(tmp_path / "d2.html"))
    upsert.write_upsert(spark, mm12b, target, keys=["city", "publish_date"])
    out = spark.read.parquet(target)
    assert out.count() == 6  # still 3 cities x 2 days, day 2 replaced
    day2 = out.where(F.col("publish_date") == F.lit("2023-05-09").cast("date"))
    prices = sorted(r.price for r in day2.collect())
    assert prices == [5000.0, 5001.0, 5002.0]


def test_id_capture_survives_nested_elements(spark, tmp_path):
    """A nested element inside an id-bearing span must not pop the capture
    early: <span id=publishtime>发布时间：<b>2026-08-14 10:00</b></span>
    previously truncated at the inner </b> and mis-scoped outer captures."""
    from data_integration_celery_spark.sources import html_table as H

    html = ('<html><body id="outer">before '
            '<span id="publishtime">ts: <b>2026-08-14 10:00</b></span>'
            ' after<br><table><tr><td>x</td></tr></table></body></html>')
    p = H._TableExtract()
    p.feed(html)
    assert p.id_texts["publishtime"] == "ts: 2026-08-14 10:00"
    assert "2026-08-14 10:00" in p.id_texts["outer"]
    assert "after" in p.id_texts["outer"]  # capture outlived nested tags
    assert p.tables == [[["x"]]]


def test_id_capture_survives_implied_end_tags(spark, tmp_path):
    """HTML5-valid unclosed <p>/<li> inside a captured element must not
    inflate the open-element depth forever: the depth-counter regression
    silently never recorded the id text on dirty vendor pages."""
    from data_integration_celery_spark.sources import html_table as H

    html = ('<div id="publishtime"><p>first<p>2026-08-14 10:00</div>'
            '<ul><li>a<li>b</ul>'
            '<span id="note">n1</span>')
    p = H.parse_html(html)
    assert "2026-08-14 10:00" in p.id_texts["publishtime"]
    assert p.id_texts["note"] == "n1"


def test_tables_survive_unclosed_tr_td_and_eof(spark, tmp_path):
    """Implied end tags inside tables: new <tr>/<td> closes the open one
    (the old parser overwrote the in-flight cell, dropping its text), and
    EOF flushes whatever is still open on a truncated page."""
    from data_integration_celery_spark.sources import html_table as H

    html = ('<table><tr><td>a<td>b<tr><td>c</table>'
            '<span id="t">captured')  # truncated: no </span>, no </html>
    p = H.parse_html(html)
    assert p.tables == [[["a", "b"], ["c"]]]
    assert p.id_texts["t"] == "captured"  # EOF flush


def test_nested_table_inside_td_keeps_outer_cell(spark, tmp_path):
    from data_integration_celery_spark.sources import html_table as H

    html = ('<table><tr><td>outer'
            '<table><tr><td>inner</td></tr></table>'
            '</td><td>z</td></tr></table>')
    p = H.parse_html(html)
    assert [["inner"]] in p.tables
    outer = [t for t in p.tables if t != [["inner"]]][0]
    assert outer[0][0].startswith("outer") and outer[0][-1] == "z"
