"""Run every oracle-checked query against DuckDB at an arbitrary scale
factor — the cross-SF robustness sweep (the driver checks sf0.01 only).

Usage: python scripts/oracle_sweep.py /root/testdata/sf0.1
"""

import os, sys, math, datetime
import pandas as pd
import duckdb
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from clickhousemigrators3_spark import TABLES
from clickhousemigrators3_spark.registry import load_all
from clickhousemigrators3_spark.session import get_spark
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))
from test_oracle_parity import _canon

sf_dir = sys.argv[1]
reg = load_all()
spark = get_spark(master='local[16]', shuffle_partitions=16)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
bad = 0
for name, q in sorted(reg.items()):
    if q.oracle is None:
        continue
    try:
        sp = q.fn(spark, sf_dir).toPandas()
        du = con.execute(q.oracle).df()
        s_cols, s_rows = _canon(sp)
        d_cols, d_rows = _canon(du)
        if s_cols != d_cols or len(s_rows) != len(d_rows) or s_rows != d_rows:
            bad += 1
            print(f"MISMATCH {name}: cols {s_cols==d_cols} rows {len(s_rows)}/{len(d_rows)}")
        elif len(s_rows) == 0:
            print(f"note: {name} empty at this sf (matches oracle)")
    except Exception as ex:
        bad += 1
        print(f"ERROR {name}: {str(ex)[:120]}")
print(f"sweep {sf_dir}: {'FAIL ' + str(bad) if bad else 'ALL MATCH'}")
spark.stop()
