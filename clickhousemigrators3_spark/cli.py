"""CLI entry point — EP1 parity (reference ``cli.py:5-21`` /
``orchestrator.py:21-89``): parse/layer config → probe sink → resume →
migrate → report → exit code.

Beyond the reference's migration modes, the CLI exposes the query registry
(``list-queries`` / ``query <name>``) so the engine is drivable as an
analytics tool, not only a migrator.
"""

from __future__ import annotations

import os
import sys
import time


def cli_list_queries() -> int:
    from .registry import load_all

    for name, q in sorted(load_all().items()):
        kind = "oracle" if q.oracle is not None else "rows-only"
        print(f"{name}\t{kind}")
    return 0


def cli_query(argv: list[str]) -> int:
    """``query <name> [--sf-dir D] [--limit N] [--explain]`` — run one
    registered query and print its rows (tab-separated, driver-side limit
    applied BEFORE collect so the driver never holds a full result).

    ``--sf-dir`` defaults to ``$SPARK_GRAFT_SF_DIR`` — there is no baked-in
    path, so outside a fixture container the flag (or env var) is required."""
    from .registry import load_all
    from .session import get_spark

    if not argv or argv[0].startswith("-"):
        print("usage: query <name> [--sf-dir D] [--limit N] [--explain]", file=sys.stderr)
        return 2
    name, rest = argv[0], argv[1:]
    sf_dir, limit, explain = os.environ.get("SPARK_GRAFT_SF_DIR", ""), 20, False
    it = iter(rest)
    for a in it:
        if a == "--sf-dir":
            sf_dir = next(it)
        elif a == "--limit":
            limit = int(next(it))
        elif a == "--explain":
            explain = True
        else:
            print(f"unknown option {a}", file=sys.stderr)
            return 2
    reg = load_all()
    if name not in reg:
        print(f"unknown query {name!r} (see list-queries)", file=sys.stderr)
        return 2
    if not sf_dir:
        print(
            "--sf-dir is required (or set SPARK_GRAFT_SF_DIR)", file=sys.stderr
        )
        return 2
    spark = get_spark(app_name=f"query-{name}")
    try:
        df = reg[name].fn(spark, sf_dir)
        if explain:
            df.explain("formatted")
            return 0
        rows = df.limit(limit).collect()
        print("\t".join(df.columns))
        for r in rows:
            print("\t".join(str(v) for v in r))
        return 0
    finally:
        spark.stop()


def cli_chsql(argv: list[str]) -> int:
    """``chsql "<ClickHouse SQL>" [--sf-dir D] [--limit N] [--explain]
    [--translate-only]`` — run a ClickHouse SQL string as-is: translate
    (``functions/ch_sql.py``) → register fixture views → ``spark.sql``.
    The SURVEY §0 story made drivable: reference users paste their query
    text unchanged. ``--translate-only`` prints the emitted Spark SQL
    without starting a session; unsupported constructs refuse with a
    pointer to the operator that implements them (exit 3)."""
    from .functions.ch_sql import (
        UnsupportedCHSQL,
        run_ch_insert,
        run_ch_sql,
        split_ch_insert,
        translate_ch_sql,
    )

    if not argv or argv[0].startswith("-"):
        print(
            'usage: chsql "<ClickHouse SQL>" [--sf-dir D] [--limit N] '
            "[--explain] [--translate-only] [--dest-root R]",
            file=sys.stderr,
        )
        return 2
    sql, rest = argv[0], argv[1:]
    sf_dir, limit = os.environ.get("SPARK_GRAFT_SF_DIR", ""), 20
    dest_root = ""
    explain = translate_only = False
    it = iter(rest)
    for a in it:
        if a == "--sf-dir":
            sf_dir = next(it)
        elif a == "--limit":
            limit = int(next(it))
        elif a == "--dest-root":
            dest_root = next(it)
        elif a == "--explain":
            explain = True
        elif a == "--translate-only":
            translate_only = True
        else:
            print(f"unknown option {a}", file=sys.stderr)
            return 2
    try:
        insert = split_ch_insert(sql)
        translated = translate_ch_sql(insert[2] if insert else sql)
    except UnsupportedCHSQL as exc:
        print(f"unsupported ClickHouse SQL: {exc}", file=sys.stderr)
        return 3
    if insert and not translate_only:
        if explain:
            # Dry-run: explain the translated source SELECT instead of
            # executing the side-effecting write.
            if not sf_dir:
                print(
                    "--sf-dir is required (or set SPARK_GRAFT_SF_DIR)",
                    file=sys.stderr,
                )
                return 2
            from .session import get_spark

            spark = get_spark(app_name="chsql")
            try:
                run_ch_sql(spark, insert[2], sf_dir).explain("formatted")
                return 0
            finally:
                spark.stop()
        if not dest_root:
            print("INSERT needs --dest-root", file=sys.stderr)
            return 2
        from .session import get_spark

        spark = get_spark(app_name="chsql")
        try:
            row = run_ch_insert(
                spark, sql, dest_root, sf_dir or None
            ).collect()[0]
            print(
                f"{row.target}\t{row.path}\t{row.rows_inserted} rows\t"
                f"{row.files_added} files"
            )
            return 0
        finally:
            spark.stop()
    if translate_only:
        print(translated)
        return 0
    if not sf_dir:
        print("--sf-dir is required (or set SPARK_GRAFT_SF_DIR)", file=sys.stderr)
        return 2
    from .session import get_spark

    spark = get_spark(app_name="chsql")
    try:
        df = run_ch_sql(spark, sql, sf_dir)
        if explain:
            df.explain("formatted")
            return 0
        rows = df.limit(limit).collect()
        print("\t".join(df.columns))
        for r in rows:
            print("\t".join(str(v) for v in r))
        return 0
    finally:
        spark.stop()


def cli_optimize(argv: list[str]) -> int:
    """``optimize --path P --keys k1,k2 --versions v1 --partitions p1`` —
    OPTIMIZE FINAL DEDUPLICATE: compact a dataset keeping the latest
    version per key within each partition (``operators/maintenance.py``)."""
    from .operators.maintenance import optimize_final_deduplicate
    from .session import get_spark

    opts = _kv_opts(argv, {"--path", "--keys", "--versions", "--partitions"})
    if opts is None or not all(
        k in opts for k in ("--path", "--keys", "--versions", "--partitions")
    ):
        print(
            "usage: optimize --path P --keys k1,k2 --versions v1 "
            "--partitions p1,p2",
            file=sys.stderr,
        )
        return 2
    spark = get_spark(app_name="optimize-final")
    try:
        stats = optimize_final_deduplicate(
            spark,
            opts["--path"],
            key_cols=opts["--keys"].split(","),
            version_cols=opts["--versions"].split(","),
            partition_cols=opts["--partitions"].split(","),
        )
        print(stats)
        return 0
    finally:
        spark.stop()


def cli_ttl(argv: list[str]) -> int:
    """``ttl --path P --ts-col ts --cutoff '2024-01-01' --partitions p1`` —
    expire rows older than the cutoff: fully-expired partitions drop as
    directories, boundary partitions rewrite."""
    from .operators.maintenance import apply_ttl
    from .session import get_spark

    opts = _kv_opts(argv, {"--path", "--ts-col", "--cutoff", "--partitions"})
    if opts is None or not all(
        k in opts for k in ("--path", "--ts-col", "--cutoff", "--partitions")
    ):
        print(
            "usage: ttl --path P --ts-col C --cutoff V --partitions p1,p2",
            file=sys.stderr,
        )
        return 2
    cutoff: object = opts["--cutoff"]
    for parse in (int, float, __import__("datetime").datetime.fromisoformat):
        try:
            cutoff = parse(opts["--cutoff"])
            break
        except ValueError:
            continue
    spark = get_spark(app_name="apply-ttl")
    try:
        stats = apply_ttl(
            spark,
            opts["--path"],
            opts["--ts-col"],
            cutoff,
            opts["--partitions"].split(","),
        )
        print(stats)
        return 0
    finally:
        spark.stop()


def cli_update(argv: list[str]) -> int:
    """``update --path P --set col=expr[,col2=expr2] --where pred
    --partitions p1`` — ALTER UPDATE mutation: partition-grain
    copy-on-write; only partitions containing matching rows rewrite."""
    from .operators.maintenance import alter_update_where
    from .session import get_spark

    opts = _kv_opts(argv, {"--path", "--set", "--where", "--partitions"})
    if opts is None or not all(
        k in opts for k in ("--path", "--set", "--where", "--partitions")
    ):
        print(
            "usage: update --path P --set col=expr[,col=expr] --where pred "
            "--partitions p1,p2",
            file=sys.stderr,
        )
        return 2
    assignments = {}
    for item in _split_top_level(opts["--set"]):
        col, _, expr = item.partition("=")
        if not expr:
            print(f"bad assignment: {item!r}", file=sys.stderr)
            return 2
        assignments[col.strip()] = expr.strip()
    spark = get_spark(app_name="alter-update")
    try:
        stats = alter_update_where(
            spark,
            opts["--path"],
            assignments,
            opts["--where"],
            opts["--partitions"].split(","),
        )
        print(stats)
        return 0
    finally:
        spark.stop()


def cli_attach_partition(argv: list[str]) -> int:
    """``attach-partition --src S --dst D --partitions p1 --values v1
    [--mode copy|move|replace]`` — file-level partition exchange
    (ATTACH/MOVE/REPLACE PARTITION FROM)."""
    from .operators.maintenance import attach_partition_from
    from .session import get_spark

    opts = _kv_opts(argv, {"--src", "--dst", "--partitions", "--values", "--mode"})
    if opts is None or not all(
        k in opts for k in ("--src", "--dst", "--partitions", "--values")
    ):
        print(
            "usage: attach-partition --src S --dst D --partitions p1,p2 "
            "--values v1,v2 [--mode copy|move|replace]",
            file=sys.stderr,
        )
        return 2
    mode = opts.get("--mode", "copy")
    if mode not in ("copy", "move", "replace"):
        print(f"bad --mode {mode!r}", file=sys.stderr)
        return 2
    spark = get_spark(app_name="attach-partition")
    try:
        stats = attach_partition_from(
            spark,
            opts["--src"],
            opts["--dst"],
            opts["--partitions"].split(","),
            opts["--values"].split(","),
            move=mode == "move",
            replace=mode == "replace",
        )
        print(stats)
        return 0
    finally:
        spark.stop()


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` only at paren depth 0 and outside string literals,
    so ``--set "price=round(price, 2),note='a,b'"`` stays two assignments —
    a naive split(',') would shear SQL expressions apart."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    quote: str | None = None
    for ch in s:
        if quote is not None:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch in "([":
            depth += 1
            buf.append(ch)
        elif ch in ")]":
            depth = max(0, depth - 1)
            buf.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return [p for p in parts if p.strip()]


def _kv_opts(argv: list[str], known: set[str]) -> dict | None:
    opts: dict = {}
    it = iter(argv)
    for a in it:
        if a in known:
            try:
                opts[a] = next(it)
            except StopIteration:
                return None
        else:
            print(f"unknown option {a}", file=sys.stderr)
            return None
    return opts


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:]) if argv is None else list(argv)
    if args and args[0] == "list-queries":
        return cli_list_queries()
    if args and args[0] == "query":
        return cli_query(args[1:])
    if args and args[0] == "chsql":
        return cli_chsql(args[1:])
    if args and args[0] == "optimize":
        return cli_optimize(args[1:])
    if args and args[0] == "ttl":
        return cli_ttl(args[1:])
    if args and args[0] == "update":
        return cli_update(args[1:])
    if args and args[0] == "attach-partition":
        return cli_attach_partition(args[1:])
    return _migrate_main(argv)


def _migrate_main(argv: list[str] | None = None) -> int:
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
