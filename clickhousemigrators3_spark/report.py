"""Migration report — A5 + report shape parity (reference
``services/report.py:8-125``): JSON with ``migration_info`` / ``results`` /
``summary``, plus the per-partition ``check_results`` audit trail
(``migration.py:378-389``).

Q8 fix: ``start_time`` is stamped at run start (passed in), not at report
generation.
"""

from __future__ import annotations

import json
import os
import time


def summarize(results: list[dict]) -> dict:
    """Status tally (A5, ``report.py:20-35``) — plain Python over the small
    per-table result list (driver metadata, never row data)."""
    tally = {"completed": 0, "failed": 0, "skipped": 0, "locked": 0}
    total_rows = 0
    total_partitions = 0
    for r in results:
        tally[r.get("status", "failed")] = tally.get(r.get("status", "failed"), 0) + 1
        total_rows += r.get("migrated_rows", 0)
        total_partitions += r.get("completed_partitions", 0)
    return {
        "total_tables": len(results),
        **tally,
        "migrated_rows": total_rows,
        "migrated_partitions": total_partitions,
    }


def generate_report(
    results: list[dict],
    report_dir: str,
    start_time: float,
    config_snapshot: dict | None = None,
) -> str:
    os.makedirs(report_dir, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    path = os.path.join(report_dir, f"migration_report_{stamp}.json")
    report = {
        "migration_info": {
            "start_time": time.strftime(
                "%Y-%m-%d %H:%M:%S", time.localtime(start_time)
            ),
            "end_time": time.strftime("%Y-%m-%d %H:%M:%S"),
            "duration_sec": round(time.time() - start_time, 3),
            "config": config_snapshot or {},
        },
        "results": results,
        "summary": summarize(results),
    }
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    return path


def exit_code(results: list[dict]) -> int:
    """C11 parity (``orchestrator.py:74-80``): any failed table → 1."""
    return 1 if any(r.get("status") == "failed" for r in results) else 0
