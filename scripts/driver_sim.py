"""Simulate the driver's correctness harness against a VANILLA SparkSession.

The per-round harness builds its own SparkSession (none of session.get_spark's
confs) and canonicalizes results by sorting every output column — so every
registered query must (a) run on an unconfigured session and (b) emit only
scalar (sortable/hashable) columns. This script checks both for ALL queries,
then runs full DuckDB parity for the oracle-backed ones.

Usage: python scripts/driver_sim.py [sf_dir] [name ...]
(default /root/testdata/sf0.01, all queries; extra args filter by name)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql.types import ArrayType, MapType, StructType

from clickhousemigrators3_spark import TABLES
from clickhousemigrators3_spark.registry import load_all

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
)
from test_oracle_parity import _canon  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = set(sys.argv[2:])
reg = load_all()
if only:
    reg = {k: v for k, v in reg.items() if k in only}

# VANILLA session — deliberately no nanosAsLong / AQE / timezone confs.
spark = SparkSession.builder.master("local[16]").appName("driver_sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

bad = 0
for name, q in sorted(reg.items()):
    try:
        df = q.fn(spark, sf_dir)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            bad += 1
            print(f"COMPLEX-DTYPE {name}: {complex_cols}")
            continue
        sp = df.toPandas()
        if q.oracle is None:
            if len(sp) < 0:  # pragma: no cover
                pass
            print(f"rows-only {name}: {len(sp)} rows OK")
            continue
        du = con.execute(q.oracle).df()
        s_cols, s_rows = _canon(sp)
        d_cols, d_rows = _canon(du)
        if s_cols != d_cols:
            bad += 1
            print(f"SCHEMA-MISMATCH {name}: {s_cols} vs {d_cols}")
        elif s_rows != d_rows:
            bad += 1
            print(f"VALUE-MISMATCH {name}: rows {len(s_rows)}/{len(d_rows)}")
    except Exception as ex:
        bad += 1
        print(f"ERROR {name}: {str(ex).splitlines()[-1][:200]}")

print(f"driver_sim {sf_dir}: {'FAIL ' + str(bad) if bad else 'ALL PASS'} ({len(reg)} queries)")
spark.stop()
