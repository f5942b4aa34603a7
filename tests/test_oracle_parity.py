"""Driver-faithful oracle check: run every registered Spark query and its
DuckDB oracle at sf0.01, compare row count, column names, and values
(order-insensitive, exact — floats must match to the bit, which the
decimal-exact aggregation discipline guarantees)."""

from __future__ import annotations

import datetime
import math

import pandas as pd
import pytest

from clickhousemigrators3_spark import TABLES
from clickhousemigrators3_spark.registry import load_all

SF_DIR = "/root/testdata/sf0.01"


def _register_views(duck):
    for t in TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return datetime.datetime(v.year, v.month, v.day)
    if hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0:  # numpy array (list col)
        return tuple(_norm_cell(x) for x in v.tolist())
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return cols, rows


QUERIES = load_all()
WITH_ORACLE = [n for n, q in QUERIES.items() if q.oracle is not None]
ROWS_ONLY = [n for n, q in QUERIES.items() if q.oracle is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    q = QUERIES[name]
    _register_views(duck)
    spark_pdf = q.fn(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(q.oracle).df()

    s_cols, s_rows = _canon(spark_pdf)
    d_cols, d_rows = _canon(duck_pdf)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
