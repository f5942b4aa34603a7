"""Dump .explain("formatted") of named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/dump_plan_files.py <tag> <suffix> <name> [name ...]
e.g.   python scripts/dump_plan_files.py r14 before dedup_substring_retained
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from clickhousemigrators3_spark import TABLES
    from clickhousemigrators3_spark.catalog import load_table
    from clickhousemigrators3_spark.registry import load_all
    from clickhousemigrators3_spark.session import get_spark

    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    registry = load_all()
    spark = get_spark(
        app_name="dump_plan_files",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    for t in TABLES:
        load_table(spark, SF_DIR, t)
    for name in names:
        q = registry.get(name)
        if q is None:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        df = q.fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# wrote {path} ({plan.count('Exchange')} Exchange)", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
