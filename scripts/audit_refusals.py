"""Refusal-SITE coverage audit (round-11 verdict #6).

``docs/REFUSALS.md`` golden-verifies refusal CONSTRUCTS, but ch_sql.py has
~180 ``raise UnsupportedCHSQL`` sites and nothing proved which of them any
golden actually reaches — an unreached site's message (and the rewrite
hint inside it) could be wrong, stale, or dead code without anyone
noticing. This audit makes the mapping mechanical:

1. AST-parse ch_sql.py and collect every ``raise UnsupportedCHSQL(…)`` /
   ``raise _NeedsSchemaTyping(…)`` construction site (line span of the
   exception-call node — the instrumented frame line lands inside it even
   for multi-line messages).
2. Instrument ``UnsupportedCHSQL.__init__`` to record the ch_sql.py frame
   line at construction, then run EVERY golden through
   ``dump_refusals.collect()`` (the same discovery the inventory uses).
3. A site is covered when a recorded line falls inside its span. Sites
   not covered must carry an explicit allowlist marker on the ``raise``
   line:  ``# no-golden: <reason>`` — used for (a) defensive guards that
   are unreachable by construction, and (b) sites only reachable through
   the session path (run_ch_sql probe typing, WITH FILL expansion, the
   INSERT surface), which the string-only golden suite cannot drive but
   pytest covers.

Exit 0 when every site is covered-or-allowlisted; exit 1 listing the
orphans otherwise. ``check_evidence.py`` runs this as part of the round's
evidence gate.
"""

from __future__ import annotations

import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

CH_SQL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "clickhousemigrators3_spark",
    "functions",
    "ch_sql.py",
)

MARKER = "# no-golden:"


def raise_sites(src: str) -> list[tuple[int, int, bool, str]]:
    """``(lineno, end_lineno, allowlisted, first_line_text)`` for every
    UnsupportedCHSQL/_NeedsSchemaTyping construction inside a raise."""
    lines = src.splitlines()
    out = []
    for node in ast.walk(ast.parse(src)):
        if not (isinstance(node, ast.Raise) and node.exc is not None):
            continue
        exc = node.exc
        if not (
            isinstance(exc, ast.Call)
            and isinstance(exc.func, ast.Name)
            and exc.func.id in ("UnsupportedCHSQL", "_NeedsSchemaTyping")
        ):
            continue
        allow = MARKER in lines[node.lineno - 1]
        out.append(
            (
                exc.lineno,
                exc.end_lineno or exc.lineno,
                allow,
                " ".join(lines[node.lineno - 1].strip().split()),
            )
        )
    return sorted(out)


def golden_hit_lines() -> set[int]:
    """ch_sql.py frame lines recorded while running every refusal golden."""
    from clickhousemigrators3_spark.functions import ch_sql as mod

    hits: set[int] = set()
    orig = mod.UnsupportedCHSQL.__init__

    def recording_init(self, *args, **kwargs):
        f = sys._getframe(1)
        while f is not None and not f.f_code.co_filename.endswith(
            "ch_sql.py"
        ):
            f = f.f_back
        if f is not None:
            hits.add(f.f_lineno)
        return orig(self, *args, **kwargs)

    mod.UnsupportedCHSQL.__init__ = recording_init
    try:
        import dump_refusals

        dump_refusals.collect()  # runs every golden through translate_ch_sql
    finally:
        mod.UnsupportedCHSQL.__init__ = orig
    return hits


def audit() -> tuple[list[tuple[int, str]], int, int, int]:
    """``(orphans, n_sites, n_covered, n_allowlisted)`` where orphans are
    ``(lineno, text)`` of sites with neither a golden nor a marker."""
    with open(CH_SQL, encoding="utf-8") as f:
        src = f.read()
    sites = raise_sites(src)
    hits = golden_hit_lines()
    orphans = []
    covered = allowed = 0
    for lo, hi, allow, text in sites:
        if any(lo <= h <= hi for h in hits):
            covered += 1
        elif allow:
            allowed += 1
        else:
            orphans.append((lo, text))
    return orphans, len(sites), covered, allowed


def main() -> int:
    orphans, n_sites, covered, allowed = audit()
    print(
        f"refusal sites: {n_sites} total, {covered} golden-covered, "
        f"{allowed} allowlisted ('{MARKER} <reason>')"
    )
    if orphans:
        print(f"ORPHAN refusal sites ({len(orphans)}) — add a golden to "
              "tests/test_ch_sql.py or a marker with a reason:")
        for lineno, text in orphans:
            print(f"  ch_sql.py:{lineno}  {text[:90]}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
