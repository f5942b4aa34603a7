"""Post-execution query metrics — ClickHouse ``EXPLAIN ANALYZE`` /
``system.query_log`` parity (read_rows, result_rows, shuffle volume,
spills) from Spark's own SQLMetrics.

Every physical operator carries SQLMetric accumulators that executors
update as tasks run; after an action, walking the executed plan yields the
real numbers — rows each scan produced, bytes each exchange wrote, spill
bytes — the observability surface a migration/pipeline operator watches in
``system.query_log``. Works under AQE: the walk descends into materialized
query stages (``executedPlan``/``finalPhysicalPlan`` accessors), and every
metric is deduplicated by its accumulator id, so a node reachable through
several wrapper paths is counted once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _iter_scala(seq):
    it = seq.iterator()
    while it.hasNext():
        yield it.next()


def _walk(node, visit, depth: int = 0) -> None:
    if depth > 60:  # wrapper cycles shouldn't exist; belt and braces
        return
    visit(node)
    for child in _iter_scala(node.children()):
        _walk(child, visit, depth + 1)
    # AQE wrappers (AdaptiveSparkPlan, QueryStage) expose the materialized
    # plan behind accessors, not children()
    for attr in ("executedPlan", "finalPhysicalPlan", "plan"):
        try:
            _walk(getattr(node, attr)(), visit, depth + 1)
        except Exception:  # noqa: BLE001 — accessor absent on this node type
            pass


def collect_plan_metrics(df: DataFrame) -> list[dict]:
    """Per-operator metric snapshot of the last execution of ``df``'s plan.
    Call AFTER an action (count/collect/write) or the metrics are zero.
    Returns ``[{"operator": name, "metrics": {metric_key: value}}, ...]``
    with each underlying accumulator reported exactly once (metric keys are
    Spark's internal names: numOutputRows, shuffleBytesWritten, spillSize,
    numFiles, filesSize, ...)."""
    out: list[dict] = []
    seen_acc: set[int] = set()

    def visit(node) -> None:
        metrics = {}
        try:
            for kv in _iter_scala(node.metrics().iterator()):
                metric = kv._2()
                acc_id = int(metric.id())
                if acc_id in seen_acc:
                    continue
                seen_acc.add(acc_id)
                metrics[str(kv._1())] = int(metric.value())
        except Exception:  # noqa: BLE001 — some wrappers carry no metrics
            return
        if metrics:
            out.append({"operator": str(node.nodeName()), "metrics": metrics})

    _walk(df._jdf.queryExecution().executedPlan(), visit)
    return out


def run_with_metrics(df: DataFrame) -> dict:
    """Execute ``df`` (count action) and summarize the query_log-style
    totals:

    * ``result_rows`` — rows of the final result;
    * ``scan_rows`` — rows produced by all file scans (ClickHouse
      ``read_rows``);
    * ``scan_files`` / ``scan_bytes`` — files and bytes read;
    * ``shuffle_bytes_written`` — total exchange volume (the cluster
      currency; what partitioning strategy work minimizes);
    * ``spill_bytes`` — memory+disk spills (non-zero = partitions exceed
      executor memory → repartition or raise parallelism).

    Note: under AQE both the template plan and the materialized query
    stages appear in the walk; template accumulators read zero and the
    accumulator-id dedup guarantees nothing is double-counted.

    Diagnostic helper: the action is ``collect()`` on the frame's OWN
    QueryExecution (a ``count()`` would plan a new query whose metrics
    don't land on ``df``'s accumulators), so point it at final
    aggregates/samples, not at full-table extracts.
    """
    result_rows = len(df.collect())
    per_op = collect_plan_metrics(df)
    totals = {
        "result_rows": result_rows,
        "scan_rows": 0,
        "scan_files": 0,
        "scan_bytes": 0,
        "shuffle_bytes_written": 0,
        "spill_bytes": 0,
    }
    for op in per_op:
        name, m = op["operator"], op["metrics"]
        # InMemoryTableScan = reads served from a persisted relation (the
        # memory-engine analogue) — still read_rows, but no file bytes
        if (
            name.startswith("Scan")
            or name.startswith("FileScan")
            or name.startswith("InMemoryTableScan")
        ):
            totals["scan_rows"] += m.get("numOutputRows", 0)
            totals["scan_files"] += m.get("numFiles", 0)
            totals["scan_bytes"] += m.get("filesSize", 0)
        if "Exchange" in name:
            totals["shuffle_bytes_written"] += m.get("shuffleBytesWritten", 0)
        totals["spill_bytes"] += m.get("spillSize", 0)
    totals["operators"] = per_op
    return totals
