"""pytdx financial archive (gpcw*.zip) source — SURVEY S3.

Reference: tasks/pytdx/stock_fin.py:34-426 — download gpcwYYYYMMDD.zip
archives, parse the binary table inside with the pytdx crawler, rename
``colN`` → English metric names via the Chinese-caption dict, derive
``ts_code`` from the exchange prefix, and upsert on (ts_code, report_date).

The binary layout is the public pytdx one (pytdx
crawler/history_financial_crawler.py, MIT):

- file header ``<1hI1H3L``: (magic, report_date YYYYMMDD, stock_count,
  report_size_bytes, _, _); fields_per_record = report_size // 4;
- a directory of ``stock_count`` items ``<6s1c1L``: (6-byte ASCII code,
  market byte, absolute file offset of the record);
- each record: ``fields_per_record`` little-endian float32 metrics.

Here the download step is out-of-engine (no network); the parse runs
distributed through ``read_binary_archives`` (binaryFile scan →
mapInPandas), one task per archive. ``make_gpcw_zip`` writes the same
layout for fixtures, so tests exercise the real byte path.
"""

from __future__ import annotations

import io
import re
import struct
import zipfile
from datetime import date, datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_HEADER = "<1hI1H3L"
_ITEM = "<6s1c1L"

# Trimmed slice of the reference's 580-line financial_dict
# (tasks/pytdx/stock_fin.py:46-90) — '%03d中文名' → metric name. The 3-digit
# prefix is the 1-based field index in the binary record.
FINANCIAL_DICT: dict[str, str] = {
    "001基本每股收益": "EPS",
    "002扣除非经常性损益每股收益": "deductEPS",
    "003每股未分配利润": "undistributedProfitPerShare",
    "004每股净资产": "netAssetsPerShare",
    "005每股资本公积金": "capitalReservePerShare",
    "006净资产收益率": "ROE",
    "007每股经营现金流量": "operatingCashFlowPerShare",
    "008货币资金": "moneyFunds",
}

_IDX = re.compile(r"\d{3}")


def col_rename_map(financial_dict: dict[str, str] | None = None) -> dict[str, str]:
    """'colN' → metric name, N from the 3-digit caption prefix (the
    reference's col_name_dic construction, stock_fin.py:372-378)."""
    d = financial_dict or FINANCIAL_DICT
    out = {}
    for key, val in d.items():
        m = _IDX.search(key)
        if m is not None:
            out[f"col{int(m.group())}"] = val
    return out


def _ts_code(code: str) -> str:
    """Exchange suffix rule (stock_fin.py:414): 6xxxxx → Shanghai, else
    Shenzhen."""
    return code + ".SH" if code.startswith("6") else code + ".SZ"


def parse_gpcw(path: str, content: bytes,
               financial_dict: dict[str, str] | None = None) -> pd.DataFrame:
    """Parse one gpcw zip payload → (ts_code, report_date, metrics...).

    Output columns: ts_code, report_date, then every metric named in
    ``financial_dict`` (missing field indices → absent columns are NOT
    padded — the caller's out_schema handles projection).
    """
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        inner = [n for n in zf.namelist() if not n.endswith("/")]
        raw = zf.read(inner[0])
    hsize = struct.calcsize(_HEADER)
    isize = struct.calcsize(_ITEM)
    _, rdate, count, report_size, _, _ = struct.unpack(_HEADER, raw[:hsize])
    fields = report_size // 4
    rec_fmt = f"<{fields}f"
    report_date = datetime.strptime(str(rdate), "%Y%m%d").date()
    rename = col_rename_map(financial_dict)
    rows = []
    for i in range(count):
        off = hsize + i * isize
        code_b, _market, foa = struct.unpack(_ITEM, raw[off:off + isize])
        code = code_b.decode("ascii").rstrip("\x00")
        values = struct.unpack(rec_fmt, raw[foa:foa + report_size])
        row: dict[str, object] = {"ts_code": _ts_code(code),
                                  "report_date": report_date}
        for n in range(1, fields + 1):
            name = rename.get(f"col{n}")
            if name:
                row[name] = float(values[n - 1])
        rows.append(row)
    return pd.DataFrame(rows)


def out_schema(financial_dict: dict[str, str] | None = None) -> str:
    d = financial_dict or FINANCIAL_DICT
    metrics = ", ".join(f"{v} double" for v in d.values())
    return f"ts_code string, report_date date, {metrics}"


def read_stock_fin(spark: SparkSession, path_glob: str,
                   financial_dict: dict[str, str] | None = None) -> DataFrame:
    """Distributed gpcw ingest: one parse task per archive; downstream is the
    standard upsert on (ts_code, report_date)."""
    from .files import read_binary_archives

    def parse(path: str, content: bytes) -> pd.DataFrame:
        return parse_gpcw(path, content, financial_dict)

    return read_binary_archives(spark, path_glob, parse,
                                out_schema(financial_dict))


def make_gpcw_zip(path: str, report_date: date,
                  records: dict[str, list[float]]) -> None:
    """Write a gpcw archive in the real binary layout (fixture tool).

    ``records``: stock code → field values (all stocks must have the same
    field count).
    """
    fields = len(next(iter(records.values())))
    report_size = fields * 4
    hsize = struct.calcsize(_HEADER)
    isize = struct.calcsize(_ITEM)
    data_start = hsize + len(records) * isize
    header = struct.pack(_HEADER, 1, int(report_date.strftime("%Y%m%d")),
                         len(records), report_size, 0, 0)
    items, payload = [], []
    for i, (code, values) in enumerate(sorted(records.items())):
        foa = data_start + i * report_size
        market = b"1" if code.startswith("6") else b"0"
        items.append(struct.pack(_ITEM, code.encode("ascii"), market, foa))
        payload.append(struct.pack(f"<{fields}f", *values))
    blob = header + b"".join(items) + b"".join(payload)
    inner = f"gpcw{report_date.strftime('%Y%m%d')}.dat"
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(inner, blob)
