"""File sources (SURVEY S3/S5).

- CSV/Excel-style tabular files → spark.read.csv with explicit schema
  (reference: pd.read_csv of bar exports, handle_csv/merge_2_n_bar.py:28-33).
- Binary archive payloads (the pytdx financial zip, stock_fin.py:383-426) →
  binaryFile source + mapInPandas parser; the zip parser is injectable and
  stubbed here (no vendor archives in this container).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read_csv(spark: SparkSession, path: str, schema: str | None = None,
             header: bool = True) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_binary_archives(spark: SparkSession, path_glob: str,
                         parse: Callable[[str, bytes], pd.DataFrame],
                         out_schema: str) -> DataFrame:
    """binaryFile scan → distributed parse.

    ``parse(path, content) -> pdf`` runs per file inside mapInPandas; the
    reference's Chinese-column rename map lives inside the parser.
    """
    files = spark.read.format("binaryFile").load(path_glob) \
        .select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [parse(p, c) for p, c in zip(pdf["path"], pdf["content"])]
            frames = [f for f in frames if f is not None and len(f)]
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return files.mapInPandas(run, out_schema)
