"""S5 Excel source + S3 pytdx financial-zip source — fixture-driven.

The reference ingests vendor bar exports with ``pd.read_excel``
(tasks/wind/handle_csv/merge_2_n_bar.py:28-33) and the pytdx financial zips
with the pytdx crawler's binary parse + Chinese-caption rename
(tasks/pytdx/stock_fin.py:34-426). Fixtures here are generated in the same
container-native formats (real OOXML zip; real gpcw binary layout) so the
parsers are exercised end-to-end without vendor downloads.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from data_integration_celery_spark.operators import bars
from data_integration_celery_spark.sources import excel


BAR_SCHEMA = ("code string, bar_start string, open double, high double, "
              "low double, close double, vol double, amount double")


def _bar_frame() -> pd.DataFrame:
    rows = []
    for m in range(4):
        rows.append({"code": "RB2110", "bar_start": f"2021-06-01 09:{m:02d}:00",
                     "open": 100.0 + m, "high": 101.0 + m, "low": 99.0 + m,
                     "close": 100.5 + m, "vol": 10.0 + m, "amount": 1000.0 + m})
    return pd.DataFrame(rows)


def test_xlsx_roundtrip_values(tmp_path):
    path = str(tmp_path / "bars.xlsx")
    excel.write_xlsx(path, _bar_frame())
    parsed = excel.parse_xlsx(open(path, "rb").read())
    assert list(parsed.columns) == list(_bar_frame().columns)
    assert len(parsed) == 4
    assert parsed["open"].tolist() == [100.0, 101.0, 102.0, 103.0]
    assert parsed["code"].tolist() == ["RB2110"] * 4


def test_read_excel_through_rebar_pipeline(spark, tmp_path):
    """The reference's merge_2_n_bar flow: vendor 1-min xlsx export → N-min
    re-bar. Same pipeline the csv source feeds."""
    xdir = tmp_path / "xlsx"
    xdir.mkdir()
    excel.write_xlsx(str(xdir / "bars1.xlsx"), _bar_frame())
    df = excel.read_excel(spark, str(xdir / "*.xlsx"), BAR_SCHEMA)
    df = df.withColumn("bar_start", F.col("bar_start").cast("timestamp"))
    assert df.count() == 4
    out = bars.rebar(df, ["code"], "bar_start", duration="2 minutes")
    got = {r["bar_start"].strftime("%H:%M"): (r["open"], r["close"],
                                              r["high"], r["low"])
           for r in out.collect()}
    # 09:00+09:01 → open of :00, close of :01; 09:02+09:03 likewise
    assert got["09:00"] == (100.0, 101.5, 102.0, 99.0)
    assert got["09:02"] == (102.0, 103.5, 104.0, 101.0)


def test_read_excel_rename_and_missing_columns(spark, tmp_path):
    """Vendor headers map through ``rename`` (the reference's Chinese caption
    dict); columns absent from the file come back null."""
    pdf = pd.DataFrame({"代码": ["600000", "000001"], "收盘": [10.5, 7.25]})
    xdir = tmp_path / "cn"
    xdir.mkdir()
    excel.write_xlsx(str(xdir / "close.xlsx"), pdf)
    df = excel.read_excel(
        spark, str(xdir / "*.xlsx"), "code string, close double, vol double",
        rename={"代码": "code", "收盘": "close"})
    rows = {r["code"]: (r["close"], r["vol"]) for r in df.collect()}
    assert rows == {"600000": (10.5, None), "000001": (7.25, None)}


def test_pytdx_gpcw_parse_schema_and_values(spark, tmp_path):
    """S3: real binary gpcw layout through the distributed archive reader —
    ts_code suffix rule, report_date from the header, colN→metric rename."""
    import datetime

    from data_integration_celery_spark.sources import pytdx_fin

    zdir = tmp_path / "gpcw"
    zdir.mkdir()
    rd = datetime.date(2021, 3, 31)
    # 8 named fields + 2 unnamed trailing ones (the trimmed dict drops them)
    recs = {
        "600000": [0.5, 0.4, 1.2, 6.0, 2.0, 0.11, 0.9, 1e6, 7.7, 8.8],
        "000001": [0.3, 0.2, 0.8, 4.0, 1.5, 0.09, 0.7, 5e5, 1.1, 2.2],
    }
    pytdx_fin.make_gpcw_zip(str(zdir / "gpcw20210331.zip"), rd, recs)
    df = pytdx_fin.read_stock_fin(spark, str(zdir / "*.zip"))
    # one stable wide schema from the full 282-field declarative mapping
    assert len(df.columns) == 2 + 282
    assert df.columns[:12] == ["ts_code", "report_date", "EPS", "deductEPS",
                               "undistributedProfitPerShare",
                               "netAssetsPerShare", "capitalReservePerShare",
                               "ROE", "operatingCashFlowPerShare",
                               "moneyFunds", "tradingFinancialAssets",
                               "billsReceivables"]
    assert df.columns[-1] == "nonEPSSingle"  # field 282
    assert dict(df.dtypes)["EPS"] == "double"
    rows = {r["ts_code"]: r for r in df.collect()}
    assert set(rows) == {"600000.SH", "000001.SZ"}
    sh = rows["600000.SH"]
    assert sh["report_date"] == rd
    assert abs(sh["EPS"] - 0.5) < 1e-6
    assert abs(sh["ROE"] - 0.11) < 1e-6
    assert abs(sh["moneyFunds"] - 1e6) < 1e-3
    assert abs(sh["tradingFinancialAssets"] - 7.7) < 1e-6  # field 9, now named
    assert sh["totalLiquidAssets"] is None  # field 21: absent in a 10-field file
    assert sh["nonEPSSingle"] is None
    sz = rows["000001.SZ"]
    assert abs(sz["deductEPS"] - 0.2) < 1e-6


def test_pytdx_gpcw_upsert_roundtrip(spark, tmp_path):
    """The reference's end state: parsed archives upsert on
    (ts_code, report_date) — a re-landed archive replaces, not duplicates."""
    import datetime

    from data_integration_celery_spark.operators import upsert
    from data_integration_celery_spark.sources import pytdx_fin

    zdir = tmp_path / "gpcw2"
    zdir.mkdir()
    rd = datetime.date(2021, 6, 30)
    pytdx_fin.make_gpcw_zip(str(zdir / "gpcw20210630.zip"), rd,
                            {"600000": [1.0] * 8})
    target = str(tmp_path / "fin_target")
    df = pytdx_fin.read_stock_fin(spark, str(zdir / "*.zip"))
    upsert.write_upsert(spark, df, target, keys=["ts_code", "report_date"])
    # re-land with a corrected EPS
    pytdx_fin.make_gpcw_zip(str(zdir / "gpcw20210630.zip"), rd,
                            {"600000": [2.0] + [1.0] * 7})
    df2 = pytdx_fin.read_stock_fin(spark, str(zdir / "*.zip"))
    upsert.write_upsert(spark, df2, target, keys=["ts_code", "report_date"])
    out = spark.read.parquet(target).collect()
    assert len(out) == 1
    assert abs(out[0]["EPS"] - 2.0) < 1e-6


def test_xlsx_error_cells_and_missing_refs_survive(tmp_path):
    """A formula-error cell (t='e'), an ISO-date cell (t='d'), and cells
    without the OPTIONAL @r reference must parse (as text / implied
    position), never abort the whole ingest job on one bad cell."""
    import io
    import zipfile

    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="str"><v>h1</v></c>'
        '<c r="B1" t="str"><v>h2</v></c>'
        '<c r="C1" t="str"><v>h3</v></c></row>'
        # error cell + date cell + a cell with no r attribute (implied C2)
        '<row r="2"><c r="A2" t="e"><v>#DIV/0!</v></c>'
        '<c r="B2" t="d"><v>2026-08-14</v></c>'
        '<c t="n"><v>7.5</v></c></row>'
        '</sheetData></worksheet>')
    wb = ('<?xml version="1.0"?>'
          '<workbook xmlns="http://schemas.openxmlformats.org/'
          'spreadsheetml/2006/main" '
          'xmlns:r="http://schemas.openxmlformats.org/officeDocument/'
          '2006/relationships">'
          '<sheets><sheet name="s" sheetId="1" r:id="rId1"/></sheets>'
          '</workbook>')
    rels = ('<?xml version="1.0"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            '<Relationship Id="rId1" Type="t" Target="worksheets/'
            'sheet1.xml"/></Relationships>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    parsed = excel.parse_xlsx(buf.getvalue())
    assert list(parsed.columns) == ["h1", "h2", "h3"]
    assert parsed.iloc[0].tolist() == ["#DIV/0!", "2026-08-14", 7.5]


def test_xlsx_malformed_numeric_cell_nulls_and_flags(tmp_path):
    """A numeric (t='n') cell whose text does not parse as float must come
    back as NULL — returning the raw text silently widened the whole
    column to mixed object dtype downstream — and its cell ref must be
    recorded so the ingest can quarantine the file."""
    import io
    import zipfile

    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="str"><v>h1</v></c></row>'
        '<row r="2"><c r="A2" t="n"><v>12.5</v></c></row>'
        '<row r="3"><c r="A3" t="n"><v>n/a</v></c></row>'
        '<row r="4"><c r="A4" t="n"><v>7</v></c></row>'
        '</sheetData></worksheet>')
    wb = ('<?xml version="1.0"?>'
          '<workbook xmlns="http://schemas.openxmlformats.org/'
          'spreadsheetml/2006/main" '
          'xmlns:r="http://schemas.openxmlformats.org/officeDocument/'
          '2006/relationships">'
          '<sheets><sheet name="s" sheetId="1" r:id="rId1"/></sheets>'
          '</workbook>')
    rels = ('<?xml version="1.0"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            '<Relationship Id="rId1" Type="t" Target="worksheets/'
            'sheet1.xml"/></Relationships>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    parsed = excel.parse_xlsx(buf.getvalue())
    assert parsed["h1"].tolist()[0] == 12.5
    assert parsed["h1"].tolist()[2] == 7.0
    assert parsed["h1"].isna().tolist() == [False, True, False]
    assert parsed.attrs["malformed_numeric_cells"] == ["A3"]


def _raw_xlsx(sheet_xml: str) -> bytes:
    """Minimal OOXML zip around one worksheet payload (shared by the
    edge-case tests below)."""
    import io
    import zipfile

    wb = ('<?xml version="1.0"?>'
          '<workbook xmlns="http://schemas.openxmlformats.org/'
          'spreadsheetml/2006/main" '
          'xmlns:r="http://schemas.openxmlformats.org/officeDocument/'
          '2006/relationships">'
          '<sheets><sheet name="s" sheetId="1" r:id="rId1"/></sheets>'
          '</workbook>')
    rels = ('<?xml version="1.0"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            '<Relationship Id="rId1" Type="t" Target="worksheets/'
            'sheet1.xml"/></Relationships>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return buf.getvalue()


def test_xlsx_empty_sheet_keeps_attrs_contract():
    """The documented attrs['malformed_numeric_cells'] key must exist on
    the empty-sheet early return too — callers following the docstring
    previously got a KeyError on empty files."""
    sheet = ('<?xml version="1.0"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData/></worksheet>')
    parsed = excel.parse_xlsx(_raw_xlsx(sheet))
    assert parsed.empty
    assert parsed.attrs["malformed_numeric_cells"] == []


def test_read_excel_surfaces_bad_cells_column(spark, tmp_path):
    """Distributed quarantine: pandas attrs do not survive the Arrow
    boundary, so read_excel(bad_cells_col=...) must carry each file's
    malformed-cell refs as a real column; a name colliding with the
    output schema raises."""
    import pytest

    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="str"><v>h1</v></c></row>'
        '<row r="2"><c r="A2" t="n"><v>12.5</v></c></row>'
        '<row r="3"><c r="A3" t="n"><v>n/a</v></c></row>'
        '</sheetData></worksheet>')
    (tmp_path / "f.xlsx").write_bytes(_raw_xlsx(sheet))
    out = excel.read_excel(spark, str(tmp_path / "*.xlsx"),
                           "h1 double", bad_cells_col="bad_cells").collect()
    assert len(out) == 2
    assert all(r["bad_cells"] == ["A3"] for r in out)
    with pytest.raises(ValueError, match="collides"):
        excel.read_excel(spark, str(tmp_path / "*.xlsx"),
                         "h1 double", bad_cells_col="h1")
