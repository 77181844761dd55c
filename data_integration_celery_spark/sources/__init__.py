"""Batch sources (SURVEY S1-S5).

S1 (table scan) lives in catalog.py. This package holds the vendor-connector
pattern (S2) and file sources (S3/S5). The reference's Selenium scraper (S4)
is an out-of-engine collector by design — it lands files that S5 reads.
"""
