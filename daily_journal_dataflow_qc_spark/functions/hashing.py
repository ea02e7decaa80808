"""Portable (engine-agnostic) hashing used by dedup/fingerprint operators.

Spark's builtin ``hash``/``xxhash64`` aren't reproducible in other engines;
for oracle-checkable operators we use the first 15 hex chars of md5 as a
60-bit integer — identical in Spark (``conv``), DuckDB (hex cast), and
Python (``int(hexdigest[:15], 16)``).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def hex_hash(col: Column) -> Column:
    """60-bit md5-prefix hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def seeded_hash(col: Column, seed: str) -> Column:
    return hex_hash(F.concat(F.lit(seed), col))


def py_hex_hash(s: str, seed: str = "") -> int:
    return int(hashlib.md5((seed + s).encode()).hexdigest()[:15], 16)


HEX_HASH_SQL = "CAST(('0x' || substring(md5({x}), 1, 15)) AS BIGINT)"
