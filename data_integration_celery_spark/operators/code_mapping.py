"""Cross-vendor entity resolution — the code_mapping dimension (SURVEY §1.1).

Reference: one logical instrument linked across vendor namespaces in
``code_mapping(unique_code, wind_code, ths_code, jq_code, market, type)``
(/root/reference tasks/backend/orm.py:27-35), maintained by three moves
(tasks/merge/code_mapping.py):
  1. insert rows for vendor codes not yet mapped (:37-60 — anti-join);
  2. fill a vendor column on existing rows by joining another vendor's code
     on the shared symbol root (:74-117 — correlated UPDATE…JOIN);
  3. fuzzy-link funds by normalized full name equality (:85-93).

Spark-native: the mapping is a small dimension rebuilt functionally each
maintenance run (union + coalesce), always broadcast into fact joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symbol_root(code) -> F.Column:
    """'600000.SH' → '600000' — the shared root across vendor namespaces
    (reference extracts it with substring/locate, code_mapping.py:55-56)."""
    return F.substring_index(code, ".", 1)


def normalized_name(name) -> F.Column:
    """Fuzzy-join normal form: lower, strip non-alphanumerics."""
    return F.regexp_replace(F.lower(name), r"[^a-z0-9一-鿿]+", "")


def insert_missing(mapping: DataFrame, vendor_codes: DataFrame,
                   vendor_col: str) -> DataFrame:
    """Move 1: vendor codes absent from the mapping become new rows, with
    unique_code seeded from the vendor code (the reference uses the vendor
    code as the canonical id on first sight)."""
    # drop NULL vendor codes up front: NULL = NULL is NULL in the anti-join
    # condition, so a NULL row would never match and re-insert an all-NULL
    # mapping row on EVERY maintenance run (unbounded garbage growth)
    new = (vendor_codes.select(F.col(vendor_col))
           .where(F.col(vendor_col).isNotNull())
           .distinct()
           .join(mapping.where(F.col(vendor_col).isNotNull())
                        .select(vendor_col), vendor_col, "left_anti"))
    new_rows = new.select(
        F.col(vendor_col).alias("unique_code"),
        *[F.col(vendor_col).alias(c) if c == vendor_col
          else F.lit(None).cast("string").alias(c)
          for c in mapping.columns if c != "unique_code"])
    return mapping.unionByName(new_rows.select(mapping.columns))


def fill_from_vendor(mapping: DataFrame, vendor_codes: DataFrame,
                     vendor_col: str, via: str = "root") -> DataFrame:
    """Move 2: fill NULL ``vendor_col`` cells by matching another namespace
    on the symbol root — the correlated UPDATE…JOIN as join+coalesce."""
    side = (vendor_codes.select(F.col(vendor_col).alias("__v"))
            .withColumn("__root", symbol_root(F.col("__v")))
            .groupBy("__root").agg(F.min("__v").alias("__v")))  # deterministic pick
    out = (mapping.withColumn("__root", symbol_root(F.col("unique_code")))
           .join(F.broadcast(side), "__root", "left")
           .withColumn(vendor_col, F.coalesce(F.col(vendor_col), F.col("__v")))
           .drop("__root", "__v"))
    return out


def link_by_name(mapping_a: DataFrame, names_b: DataFrame,
                 a_name: str, b_name: str, b_code: str,
                 out_col: str) -> DataFrame:
    """Move 3: fuzzy full-name equality link (fund ifind↔wind) — an
    equi-join on the normalized name, never a python loop."""
    right = (names_b.select(normalized_name(F.col(b_name)).alias("__n"),
                            F.col(b_code).alias("__c"))
             .dropDuplicates(["__n"]))
    return (mapping_a.withColumn("__n", normalized_name(F.col(a_name)))
            .join(F.broadcast(right), "__n", "left")
            .withColumn(out_col, F.coalesce(F.col(out_col), F.col("__c"))
                        if out_col in mapping_a.columns else F.col("__c"))
            .drop("__n", "__c"))
