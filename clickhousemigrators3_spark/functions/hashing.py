"""Cross-engine-stable hashing primitives.

``xxhash64``/``hash`` are Spark-private algorithms; DuckDB's ``hash`` is a
different one. For DuckDB-checkable sketches (MinHash, SimHash, checksums,
fingerprints) we derive integers from md5 hex — identical text in, identical
integer out, in both engines.

Spark side here; the SQL twins are built by :func:`oracle_hash_sql`.

60-bit values (15 hex chars) keep sums of millions of rows safely inside a
signed 64-bit accumulator (2^60 · 2^20 < 2^63 would overflow at ~8 rows for
full-width values; at 32 bits even 2^31 rows fit). Pick width per use:

* checksum-sum aggregation → 32-bit (:func:`stable_hash32`)
* MinHash / fingerprints (no summation) → 60-bit (:func:`stable_hash60`)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_hash60(col: Column) -> Column:
    """First 15 hex chars of md5 as a non-negative bigint (60 bits)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def stable_hash32(col: Column) -> Column:
    """First 8 hex chars of md5 as a non-negative bigint (32 bits) — safe to
    sum over billions of rows."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def oracle_hash_sql(expr: str, bits: int = 60) -> str:
    """DuckDB twin of the above for an arbitrary SQL expression."""
    nhex = {60: 15, 32: 8}[bits]
    return f"(('0x' || substr(md5({expr}), 1, {nhex}))::BIGINT)"


def row_concat(cols: list[str], sep: str = "\x1f") -> Column:
    """Canonical row serialization for checksums: concat of columns cast to
    string with a non-printing separator. Use only int/string/date columns —
    float→string rendering is engine-specific."""
    return F.concat_ws(sep, *[F.col(c).cast("string") for c in cols])


def oracle_row_concat(cols: list[str], sep: str = "\x1f") -> str:
    inner = ", ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    return f"concat_ws('{sep}', {inner})"
