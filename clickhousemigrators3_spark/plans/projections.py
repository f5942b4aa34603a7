"""ClickHouse PROJECTION parity — query rewrite onto pre-aggregates.

In ClickHouse, ``ALTER TABLE … ADD PROJECTION`` stores an alternative
pre-aggregated layout inside the table and the optimizer silently answers
matching queries from it. The Spark-first equivalent keeps projections as
separate parquet datasets (built/refreshed by ``rollup_maintenance.py``)
and this module supplies the missing piece: the CHOOSER that decides, per
query, whether a projection can serve it, and the REWRITE that
re-aggregates projection rows instead of scanning raw facts.

Serviceability rule (same as ClickHouse's): a projection grouped by
``G_p`` with aggregate states ``A_p`` serves a query grouped by ``G_q``
with aggregates ``A_q`` iff ``G_q ⊆ G_p`` and every aggregate in ``A_q``
is derivable from a stored state:

* ``count``  → SUM of the stored counts
* ``sum``    → SUM of the stored sums
* ``min``/``max`` → MIN/MAX of the stored mins/maxes
* ``count_distinct`` → only from a MERGEABLE state (HLL sketch / bitmap
  partial); plain stored numbers are NOT summable — the chooser refuses,
  which is precisely the mistake (summing distinct counts) this rule
  exists to prevent.

At 100 TB the win is structural: the projection's row count is bounded by
the group-key cardinality (e.g. days × hours × types ≈ 10^5 rows), so a
served query costs O(projection) instead of O(history) — and the chooser
makes the fallback to raw facts explicit rather than silent.

Reference parity note: the reference has no projection machinery (its
tables keep whatever ENGINE the DDL declared, reference ``migration.py``
DDL rewrite); this is part of the north-star analytics surface
(BASELINE.json) that makes the migrated data *queryable* at scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# aggregate functions whose stored per-group value re-aggregates with the
# given combiner when groups are coarsened
_REAGG = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


@dataclass
class ProjectionSpec:
    """A registered projection: where it lives, what it groups by, and
    which aggregate states each stored column holds.

    ``aggs`` maps stored-column name → one of ``count | sum | min | max |
    hll_state`` (``hll_state`` marks a mergeable ``hll_sketch_agg`` binary
    column)."""

    name: str
    path: str
    group_cols: list[str]
    aggs: dict[str, str] = field(default_factory=dict)

    def can_serve(self, group_cols: list[str], wanted: dict[str, str]) -> bool:
        """``wanted`` maps stored-column name → requested derivation
        (``sum``/``count``/``min``/``max`` over the stored column, or
        ``approx_count_distinct`` over an ``hll_state`` column)."""
        if not set(group_cols) <= set(self.group_cols):
            return False
        for col, how in wanted.items():
            stored = self.aggs.get(col)
            if stored is None:
                return False
            if how == "approx_count_distinct":
                if stored != "hll_state":
                    return False
            elif stored != how or how not in _REAGG:
                return False
        return True


def answer_with_projection(
    spark: SparkSession,
    raw: DataFrame,
    projections: list[ProjectionSpec],
    group_cols: list[str],
    wanted: dict[str, str],
    raw_exprs: dict[str, object] | None = None,
) -> tuple[DataFrame, str]:
    """Answer ``SELECT group_cols, aggs`` from the first projection that
    can serve it, else from ``raw`` (using ``raw_exprs``: output column →
    Spark aggregate Column over the raw frame). Returns ``(df, source)``
    where ``source`` is the projection name or ``"raw"`` — callers surface
    it so plan choices stay observable, never silent.

    The projection path re-aggregates with the state-appropriate combiner:
    stored counts/sums SUM up, mins MIN, maxes MAX, HLL states merge via
    ``hll_union_agg`` then estimate. All JVM aggregates; the input is the
    projection dataset, so the scan is bounded by group-key cardinality."""
    for p in projections:
        if not p.can_serve(group_cols, wanted):
            continue
        proj = spark.read.parquet(p.path)
        agg_cols = []
        for col, how in wanted.items():
            if how == "approx_count_distinct":
                agg_cols.append(
                    F.hll_sketch_estimate(F.hll_union_agg(col)).alias(col)
                )
            else:
                agg_cols.append(_REAGG[how](col).alias(col))
        out = proj.groupBy(*group_cols).agg(*agg_cols)
        return out, p.name
    if raw_exprs is None:
        raise ValueError(
            f"no projection serves group={group_cols} aggs={wanted} and no "
            "raw fallback expressions were provided"
        )
    out = raw.groupBy(*group_cols).agg(
        *[expr.alias(col) for col, expr in raw_exprs.items()]
    )
    return out, "raw"
