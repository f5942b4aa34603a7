"""CLI entry point — EP1 parity (reference ``cli.py:5-21`` /
``orchestrator.py:21-89``): parse/layer config → probe sink → resume →
migrate → report → exit code.
"""

from __future__ import annotations

import sys
import time


def main(argv: list[str] | None = None) -> int:
    from .catalog import probe_sink
    from .config import resolve_config
    from .operators.migrate import migrate_full_database, migrate_single_table
    from .report import exit_code, generate_report
    from .session import get_spark

    from .logging_setup import setup_logger

    cfg = resolve_config(argv)
    if not cfg.source_dir or not cfg.dest_dir:
        print("--source-dir and --dest-dir are required", file=sys.stderr)
        return 2
    logger = setup_logger(cfg.log_dir)
    start = time.time()
    spark = get_spark(app_name="spark-migrator")
    try:
        # S2: sink capability probe (ch_client.py:27-77 parity)
        if not probe_sink(spark, cfg.dest_dir):
            print(f"sink probe failed for {cfg.dest_dir}", file=sys.stderr)
            return 1
        if cfg.mode == "single":
            results = [migrate_single_table(spark, cfg, cfg.table)]
        else:
            results = migrate_full_database(spark, cfg)
        path = generate_report(
            results, cfg.report_dir, start, config_snapshot=vars(cfg)
        )
        logger.info("report written: %s", path)
        print(f"report: {path}")
        for r in results:
            print(
                f"  {r['table']}: {r['status']}"
                + (f" ({r.get('error')})" if r.get("error") else "")
            )
        return exit_code(results)  # C11
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
