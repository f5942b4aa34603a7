#!/usr/bin/env bash
# chsql demo: a reference user's migration day, driven by ClickHouse SQL
# texts only (the reference's own f-string shapes run verbatim — see
# operators/chsql_queries.py for the oracle-verified registry versions).
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"
CLI="python -m clickhousemigrators3_spark.cli"
DEST="$(mktemp -d /tmp/chsql_demo.XXXXXX)"
trap 'rm -rf "$DEST"' EXIT

echo "== 1. discover the partition key (reference partition.py:12-16) =="
$CLI chsql "SELECT partition_key FROM system.tables
            WHERE database = 'default' AND name = 'orders'" --sf-dir "$SF_DIR"

echo
echo "== 2. list active partitions (reference partition.py:107-114) =="
$CLI chsql "SELECT DISTINCT partition FROM system.parts
            WHERE database = 'default' AND table = 'orders' AND active = 1
            ORDER BY partition" --sf-dir "$SF_DIR" --limit 6

echo
echo "== 3. migrate one partition: INSERT INTO ... SELECT, verbatim =="
$CLI chsql "INSERT INTO default.orders_199501
            SELECT * FROM orders WHERE toYYYYMM(o_orderdate) = 199501" \
  --sf-dir "$SF_DIR" --dest-root "$DEST"

echo
echo "== 4. validate the copy: source-side count (reference validator.py) =="
$CLI chsql "SELECT count() AS src_rows FROM orders
            WHERE toYYYYMM(o_orderdate) = 199501" --sf-dir "$SF_DIR"

echo
echo "== 5. an analytics query, ClickHouse idioms intact =="
$CLI chsql "SELECT toYYYYMM(o_orderdate) AS ym,
                   countIf(o_orderstatus = 'F') AS nf,
                   uniqExact(o_custkey) AS custs
            FROM orders PREWHERE o_totalprice > 100
            GROUP BY ym ORDER BY ym LIMIT 5" --sf-dir "$SF_DIR"

echo
echo "== 6. running functions translate when ORDER BY pins the order =="
$CLI chsql "SELECT event_id, runningDifference(value) AS dv
            FROM events WHERE user_id < 3 ORDER BY ts, event_id" \
  --sf-dir "$SF_DIR" --limit 5

echo
echo "demo complete — migrated parquet under $DEST (auto-cleaned)"
