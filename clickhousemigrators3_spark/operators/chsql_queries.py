"""ClickHouse-SQL surface — reference query texts run VERBATIM through the
dialect translator (``functions/ch_sql.py``) and checked against DuckDB.

This is SURVEY §0's "users write ClickHouse SQL" story made first-class:
every query below is a genuine ClickHouse SQL string — the reference's own
shapes (``partition.py:107-114`` DISTINCT partition discovery,
``validator.py:24-31`` count validation, ``migration.py:475`` filtered
SELECT) plus the high-frequency ClickHouse idioms its users write (countIf /
sumIf, uniqExact, argMax, any/anyIf, quantileExact(p)(x), multiIf, PREWHERE,
ARRAY JOIN, GLOBAL IN, SETTINGS, toYYYYMM/toStartOf*/formatDateTime) — fed
to ``run_ch_sql`` (translate → ``spark.sql``), never hand-rewritten.

Scale notes: the translator only renames/reshapes — the emitted Spark SQL is
declarative, so Catalyst still gets pushdown/pruning/AQE on every query.
PREWHERE folds into WHERE (Spark pushes predicates itself); GLOBAL IN drops
to a plain IN (Spark broadcasts small subquery sides under AQE).

Cross-engine discipline (same as every module): aliases identical on both
sides; money sums pass through toDecimal64 → exact; floats rounded in the
query text itself so both engines round the same value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.ch_sql import run_ch_sql
from ..registry import register


def _ch(name: str, ch_sql: str, oracle: str, tables: tuple[str, ...]):
    """Register one ClickHouse-SQL query: Spark side = translated text."""

    @register(name, oracle)
    def _run(
        spark: SparkSession, sf_dir: str, _sql: str = ch_sql, _t=tables
    ) -> DataFrame:
        return run_ch_sql(spark, _sql, sf_dir, tables=_t)

    _run.__name__ = name
    _run.__doc__ = f"ClickHouse SQL via translate_ch_sql:\n{ch_sql}"
    return _run


# --- reference orchestration SQL, VERBATIM ---------------------------------
# The reference reads ClickHouse system tables to drive the migration; the
# catalog emulates them (catalog.register_system_views) and the translator
# rewrites the qualified names — so these query TEXTS are character-for-
# character the reference's f-strings with db='default' interpolated.

# partition.py:12-16 — get_table_partition_key
_ch(
    "chsql_sys_partition_key",
    """
                SELECT partition_key
                FROM system.tables
                WHERE database = 'default' AND name = 'orders'
            """,
    "SELECT 'toYYYYMM(o_orderdate)' AS partition_key",
    (),
)

# partition.py:107-114 — get_table_partitions
_ch(
    "chsql_sys_partition_list",
    """
                SELECT DISTINCT partition
                FROM system.parts
                WHERE database = 'default' AND table = 'orders' AND active = 1
                ORDER BY partition
                """,
    """
    SELECT DISTINCT strftime(o_orderdate, '%Y%m') AS partition
    FROM orders ORDER BY partition
    """,
    (),
)

# migration.py:139 / :425 — table-existence probe
_ch(
    "chsql_sys_table_exists",
    "SELECT name FROM system.tables WHERE database = 'default' AND name = 'lineitem'",
    "SELECT 'lineitem' AS name",
    (),
)

# migration.py:549 — enumerate migratable tables (views excluded)
_ch(
    "chsql_sys_tables_nonview",
    "SELECT name FROM system.tables WHERE database = 'default' AND engine NOT IN ('View', 'MaterializedView') ORDER BY name",
    """
    SELECT * FROM (VALUES ('customer'), ('documents'), ('embeddings'),
                          ('events'), ('lineitem'), ('nation'), ('orders'),
                          ('part'), ('region'), ('supplier')) t(name)
    ORDER BY name
    """,
    (),
)

# migration.py:266-270 — is_distributed_table engine probe (and :281's
# engine_full variant, which :287 parses for Distributed local tables)
_ch(
    "chsql_sys_engine_probe",
    """
                SELECT engine
                FROM system.tables
                WHERE database = 'default' AND name = 'orders'
            """,
    "SELECT 'MergeTree' AS engine",
    (),
)

_ch(
    "chsql_sys_engine_full",
    """
                SELECT engine_full
                FROM system.tables
                WHERE database = 'default' AND name = 'lineitem'
            """,
    "SELECT 'MergeTree PARTITION BY toYYYYMM(l_shipdate) ORDER BY tuple()' AS engine_full",
    (),
)

# ch_client.py:34 — storage-policy probe
_ch(
    "chsql_sys_storage_policy",
    "SELECT policy_name FROM system.storage_policies WHERE policy_name = 's3_main'",
    "SELECT 's3_main' AS policy_name",
    (),
)

# system.parts as a stats source: per-table row counts from partition
# metadata (the A1 count without touching the fact rows on a real server)
_ch(
    "chsql_sys_parts_rows",
    """
    SELECT table, toInt64(sum(rows)) AS total_rows
    FROM system.parts
    WHERE database = 'default' AND active = 1
    GROUP BY table
    ORDER BY table
    """,
    """
    SELECT * FROM (
      SELECT 'events' AS "table", count(*) AS total_rows FROM events
      UNION ALL SELECT 'lineitem', count(*) FROM lineitem
      UNION ALL SELECT 'orders', count(*) FROM orders
    ) t ORDER BY "table"
    """,
    ("orders", "lineitem", "events"),
)

# --- reference shapes ------------------------------------------------------

# partition.py:107-114 — ordered DISTINCT partition discovery
_ch(
    "chsql_partition_discovery",
    """
    SELECT DISTINCT toYYYYMM(o_orderdate) AS partition
    FROM orders
    ORDER BY partition
    """,
    """
    SELECT DISTINCT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS partition
    FROM orders
    ORDER BY partition
    """,
    ("orders",),
)

# validator.py:24-31 — count validation, full table + partition predicate
_ch(
    "chsql_count_validation",
    """
    SELECT count(*) AS cnt
    FROM orders
    WHERE toYYYYMM(o_orderdate) = 199506
    """,
    """
    SELECT count(*) AS cnt
    FROM orders
    WHERE CAST(strftime(o_orderdate, '%Y%m') AS INT) = 199506
    """,
    ("orders",),
)

# migration.py:475 filtered-SELECT shape + PREWHERE merged with WHERE,
# trailing GROUP BY / ORDER BY intact (the r5-verdict smoke case)
_ch(
    "chsql_prewhere_rollup",
    """
    SELECT o_orderstatus,
           count(*) AS cnt,
           toFloat64(sumIf(toDecimal64(o_totalprice, 2),
                           o_orderpriority != '1-URGENT')) AS nonurgent_total
    FROM orders
    PREWHERE o_totalprice > 1000
    WHERE o_orderstatus != 'X'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    """
    SELECT o_orderstatus,
           count(*) AS cnt,
           CAST(SUM(CASE WHEN o_orderpriority != '1-URGENT'
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS nonurgent_total
    FROM orders
    WHERE o_totalprice > 1000 AND o_orderstatus != 'X'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    ("orders",),
)

# --- conditional / distinct aggregates ------------------------------------

_ch(
    "chsql_conditional_aggs",
    """
    SELECT l_returnflag,
           countIf(l_quantity > 25) AS big_cnt,
           toFloat64(sumIf(toDecimal64(l_extendedprice, 2),
                           l_discount > 0.05)) AS disc_rev,
           uniqExact(l_orderkey) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT)
               AS big_cnt,
           CAST(SUM(CASE WHEN l_discount > 0.05
                         THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS disc_rev,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    ("lineitem",),
)

_ch(
    "chsql_argmax_any",
    """
    SELECT c_nationkey,
           argMax(c_name, c_custkey) AS newest_customer,
           argMin(c_name, c_custkey) AS oldest_customer,
           count(*) AS cnt
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    """
    SELECT c_nationkey,
           arg_max(c_name, c_custkey) AS newest_customer,
           arg_min(c_name, c_custkey) AS oldest_customer,
           count(*) AS cnt
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    ("customer",),
)

# any(x) on a group of size 1 — deterministic end-to-end check of the
# first(x, ignoreNulls=true) mapping (NULL-skip semantics are unit-tested on
# constructed frames in tests/test_ch_sql.py)
_ch(
    "chsql_any_per_key",
    """
    SELECT n_regionkey,
           any(r1) AS first_nation
    FROM (
        SELECT n_regionkey, min(n_name) AS r1
        FROM nation
        GROUP BY n_regionkey
    )
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    """
    SELECT n_regionkey, first(r1) AS first_nation
    FROM (
        SELECT n_regionkey, min(n_name) AS r1
        FROM nation
        GROUP BY n_regionkey
    ) s
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    ("nation",),
)

# --- parametric quantiles --------------------------------------------------

_ch(
    "chsql_quantiles_monthly",
    """
    SELECT toStartOfMonth(o_orderdate) AS p_month,
           round(quantileExact(0.5)(o_totalprice), 4) AS med_price,
           round(quantileExact(0.9)(o_totalprice), 4) AS p90_price,
           count(*) AS cnt
    FROM orders
    GROUP BY p_month
    ORDER BY p_month
    """,
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS p_month,
           round(quantile_cont(o_totalprice, 0.5), 4) AS med_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           count(*) AS cnt
    FROM orders
    GROUP BY p_month
    ORDER BY p_month
    """,
    ("orders",),
)

# --- multiIf + date buckets ------------------------------------------------

_ch(
    "chsql_multiif_buckets",
    """
    SELECT toInt64(toYear(o_orderdate)) AS yr,
           multiIf(o_totalprice > 300000, 'high',
                   o_totalprice > 150000, 'mid',
                   'low') AS bucket,
           count(*) AS cnt
    FROM orders
    GROUP BY yr, bucket
    ORDER BY yr, bucket
    """,
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'low' END AS bucket,
           count(*) AS cnt
    FROM orders
    GROUP BY yr, bucket
    ORDER BY yr, bucket
    """,
    ("orders",),
)

_ch(
    "chsql_formatdatetime",
    """
    SELECT formatDateTime(o_orderdate, '%Y-%m') AS ym,
           count(*) AS cnt
    FROM orders
    GROUP BY ym
    ORDER BY ym
    """,
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS cnt
    FROM orders
    GROUP BY ym
    ORDER BY ym
    """,
    ("orders",),
)

# --- strings ---------------------------------------------------------------

_ch(
    "chsql_string_probe",
    """
    SELECT countIf(match(text, 'data')) AS n_match,
           countIf(position(text, 'the') > 0) AS n_pos,
           uniqExact(extract(lang, '^[a-z]+')) AS n_lang_prefix,
           countIf(notEmpty(source)) AS n_nonempty_src
    FROM documents
    """,
    """
    SELECT CAST(SUM(CASE WHEN regexp_matches(text, 'data') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_match,
           CAST(SUM(CASE WHEN strpos(text, 'the') > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pos,
           count(DISTINCT regexp_extract(lang, '^[a-z]+', 0))
               AS n_lang_prefix,
           CAST(SUM(CASE WHEN length(source) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nonempty_src
    FROM documents
    """,
    ("documents",),
)

# --- ARRAY JOIN ------------------------------------------------------------

_ch(
    "chsql_array_join_tokens",
    """
    SELECT lang,
           count(*) AS n_tokens,
           uniqExact(tok) AS uniq_tokens
    FROM documents
    ARRAY JOIN splitByChar(' ', text) AS tok
    GROUP BY lang
    ORDER BY lang
    """,
    """
    SELECT lang, count(*) AS n_tokens, count(DISTINCT tok) AS uniq_tokens
    FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ) s
    GROUP BY lang
    ORDER BY lang
    """,
    ("documents",),
)

# --- array higher-order functions -----------------------------------------

_ch(
    "chsql_array_hof",
    """
    SELECT doc_id,
           toFloat64(arraySum(arrayMap(w -> lengthUTF8(w),
                                       splitByChar(' ', text)))) AS char_sum,
           arrayStringConcat(arrayFilter(w -> lengthUTF8(w) > 6,
                                         splitByChar(' ', text)), '-')
               AS long_words
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
    """
    SELECT doc_id,
           CAST(list_sum(list_transform(string_split(text, ' '),
                                        w -> length(w))) AS DOUBLE)
               AS char_sum,
           COALESCE(array_to_string(list_filter(string_split(text, ' '),
                                                w -> length(w) > 6), '-'),
                    '') AS long_words
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
    ("documents",),
)

# --- dateDiff + camelCase statistical aggregates ---------------------------

_ch(
    "chsql_datediff_stats",
    """
    SELECT toInt64(toYear(o_orderdate)) AS yr,
           round(stddevPop(o_totalprice), 4) AS sd_price,
           max(dateDiff('day', toStartOfYear(o_orderdate), o_orderdate))
               AS max_day_offset
    FROM orders
    GROUP BY yr
    ORDER BY yr
    """,
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           round(stddev_pop(o_totalprice), 4) AS sd_price,
           max(date_diff('day', CAST(date_trunc('year', o_orderdate) AS DATE),
                         o_orderdate)) AS max_day_offset
    FROM orders
    GROUP BY yr
    ORDER BY yr
    """,
    ("orders",),
)

# --- JSON extraction -------------------------------------------------------

_ch(
    "chsql_json_extract",
    """
    SELECT event_type,
           toInt64(sum(JSONExtractInt(props, 'k'))) AS sum_k,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    """
    SELECT event_type,
           CAST(SUM(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    ("events",),
)

# --- scalar WITH macro -----------------------------------------------------

_ch(
    "chsql_with_macro",
    """
    WITH toFloat64(sumIf(toDecimal64(l_extendedprice, 2),
                         l_discount > 0.05)) AS disc_rev
    SELECT l_returnflag,
           disc_rev AS discounted_revenue,
           count(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_discount > 0.05
                         THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS discounted_revenue,
           count(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    ("lineitem",),
)

# --- toStartOfInterval bucketing ------------------------------------------

_ch(
    "chsql_interval_buckets",
    """
    SELECT toStartOfInterval(ts, INTERVAL 6 hour) AS bucket,
           count(*) AS cnt,
           uniqExact(user_id) AS users
    FROM events
    GROUP BY bucket
    ORDER BY bucket
    """,
    """
    SELECT make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)
                          * 1000000) AS bucket,
           count(*) AS cnt,
           count(DISTINCT user_id) AS users
    FROM events
    GROUP BY bucket
    ORDER BY bucket
    """,
    ("events",),
)

# --- GLOBAL IN + SETTINGS strip -------------------------------------------

_ch(
    "chsql_global_in",
    """
    SELECT count(*) AS cnt
    FROM lineitem
    WHERE l_orderkey GLOBAL IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SETTINGS max_threads = 4
    """,
    """
    SELECT count(*) AS cnt
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
    ("lineitem", "orders"),
)

# --- LIMIT n BY: ClickHouse's per-group top-n sugar ------------------------
# Translated to the row_number window form (functions/ch_sql.py
# _rewrite_limit_by); deterministic because the ORDER BY tie-breaks on
# o_orderkey. Reference query shape: "latest/top rows per key" reads.

_ch(
    "chsql_limit_by_top_orders",
    """
    SELECT o_orderstatus, o_orderkey, toFloat64(o_totalprice) AS price
    FROM orders
    ORDER BY price DESC, o_orderkey
    LIMIT 2 BY o_orderstatus
    """,
    """
    SELECT o_orderstatus, o_orderkey, price FROM (
        SELECT o_orderstatus, o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS price,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY CAST(o_totalprice AS DOUBLE) DESC,
                                           o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 2
    ORDER BY price DESC, o_orderkey
    """,
    ("orders",),
)

# LIMIT BY over an aggregate + trailing LIMIT: top line-status per return
# flag by line count, global cap applied AFTER the per-group cut
_ch(
    "chsql_limit_by_agg",
    """
    SELECT l_returnflag, l_linestatus, count() AS cnt
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY cnt DESC, l_returnflag, l_linestatus
    LIMIT 1 BY l_returnflag
    LIMIT 2
    """,
    """
    SELECT l_returnflag, l_linestatus, cnt FROM (
        SELECT l_returnflag, l_linestatus, count(*) AS cnt,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY count(*) DESC, l_returnflag,
                                           l_linestatus) AS rn
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    ) WHERE rn <= 1
    ORDER BY cnt DESC, l_returnflag, l_linestatus
    LIMIT 2
    """,
    ("lineitem",),
)

# --- ORDER BY … WITH FILL: result-set densification ------------------------
# run_ch_sql expands the fill via the schema-aware dense-axis rewrite
# (functions/ch_sql.py _expand_with_fill): LEAD window over the result,
# sequence()+explode per gap, ClickHouse type defaults (0/'') on generated
# rows. The fixture filter (user_id % 503) leaves real day gaps at every SF,
# so the fill path is exercised, not vacuous.

# Date axis, bounds inferred from the data (FROM/TO omitted): sparse daily
# purchase counts densified to every day between the first and last active
# day. ClickHouse shape: time-series dashboards over event tables.
_ch(
    "chsql_with_fill_days",
    """
    SELECT toDate(ts) AS d, count() AS n
    FROM events
    WHERE event_type = 'purchase' AND user_id % 503 = 0
    GROUP BY d
    ORDER BY d WITH FILL
    """,
    """
    WITH src AS (
        SELECT CAST(ts AS DATE) AS d, count(*) AS n
        FROM events
        WHERE event_type = 'purchase' AND user_id % 503 = 0
        GROUP BY 1
    ), axis AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
        FROM (SELECT CAST(min(d) AS TIMESTAMP) AS lo,
                     CAST(max(d) AS TIMESTAMP) AS hi FROM src)
        WHERE lo IS NOT NULL
    )
    SELECT a.d AS d, COALESCE(s.n, 0) AS n
    FROM axis a LEFT JOIN src s ON a.d = s.d
    ORDER BY d
    """,
    ("events",),
)

# Integer axis with explicit FROM/TO (TO exclusive) and a string column
# carrying the ClickHouse '' default on generated rows: line numbers 1..7
# exist in the data, the fill pads 8 and 9.
_ch(
    "chsql_with_fill_int_range",
    """
    SELECT l_linenumber AS ln, count() AS n, min(l_returnflag) AS flag
    FROM lineitem
    WHERE l_quantity <= 2
    GROUP BY ln
    ORDER BY ln WITH FILL FROM 1 TO 10
    """,
    """
    WITH src AS (
        SELECT l_linenumber AS ln, count(*) AS n, min(l_returnflag) AS flag
        FROM lineitem
        WHERE l_quantity <= 2
        GROUP BY 1
    ), axis AS (
        SELECT CAST(unnest(generate_series(1, 9)) AS INTEGER) AS ln
    )
    SELECT a.ln AS ln, COALESCE(s.n, 0) AS n, COALESCE(s.flag, '') AS flag
    FROM axis a LEFT JOIN src s ON a.ln = s.ln
    ORDER BY ln
    """,
    ("lineitem",),
)

# INTERPOLATE (bare-column form): carried last-observation on generated
# rows — the dashboard LOCF shape. Gap days get n=0 (type default) but
# carry the previous active day's rounded max purchase value.
_ch(
    "chsql_with_fill_interpolate",
    """
    SELECT toDate(ts) AS d, count() AS n, round(max(value), 2) AS mx
    FROM events
    WHERE event_type = 'purchase' AND user_id % 503 = 0
    GROUP BY d
    ORDER BY d WITH FILL INTERPOLATE (mx)
    """,
    """
    WITH src AS (
        SELECT CAST(ts AS DATE) AS d, count(*) AS n,
               round(max(value), 2) AS mx
        FROM events
        WHERE event_type = 'purchase' AND user_id % 503 = 0
        GROUP BY 1
    ), axis AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
        FROM (SELECT CAST(min(d) AS TIMESTAMP) AS lo,
                     CAST(max(d) AS TIMESTAMP) AS hi FROM src)
        WHERE lo IS NOT NULL
    )
    SELECT a.d AS d, COALESCE(s.n, 0) AS n,
           last_value(s.mx IGNORE NULLS)
             OVER (ORDER BY a.d ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS mx
    FROM axis a LEFT JOIN src s ON a.d = s.d
    ORDER BY d
    """,
    ("events",),
)

# Array wave-2 surface under oracle: sort/distinct shape the nondeterministic
# groupArray into a canonical list; arraySum(arrayDifference(sorted)) = the
# telescoping max-min spread, which the oracle states directly.
_ch(
    "chsql_array_wave2",
    """
    SELECT l_returnflag AS flag,
           arrayStringConcat(arrayMap(x -> toString(x),
               arraySort(arrayDistinct(groupArray(l_linenumber)))), ',')
             AS lns,
           arraySum(arrayDifference(
               arraySort(arrayDistinct(groupArray(l_linenumber))))) AS spread
    FROM lineitem
    WHERE l_orderkey < 100
    GROUP BY l_returnflag
    ORDER BY flag
    """,
    """
    SELECT l_returnflag AS flag,
           array_to_string(list_sort(list_distinct(list(l_linenumber))), ',')
             AS lns,
           CAST(max(l_linenumber) - min(l_linenumber) AS DOUBLE) AS spread
    FROM lineitem
    WHERE l_orderkey < 100
    GROUP BY l_returnflag
    ORDER BY flag
    """,
    ("lineitem",),
)

# String wave-2 surface under oracle: case-insensitive position, any-needle
# containment, and whitespace squeeze over the documents corpus.
_ch(
    "chsql_string_wave2",
    """
    SELECT doc_id,
           positionCaseInsensitive(text, 'TABLE') AS pos,
           multiSearchAny(text, array('vector', 'window')) AS hit,
           length(replaceAll(text, ' ', '')) AS squeezed
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
    """
    SELECT doc_id,
           strpos(lower(text), 'table') AS pos,
           (text LIKE '%vector%' OR text LIKE '%window%') AS hit,
           length(replace(text, ' ', '')) AS squeezed
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
    ("documents",),
)

# Date wave-2 surface under oracle: month-end rollup bounded by dateAdd.
_ch(
    "chsql_datetime_wave2",
    """
    SELECT toLastDayOfMonth(o_orderdate) AS eom, count() AS n
    FROM orders
    WHERE o_orderdate < dateAdd('month', 3, toDate('1995-01-01'))
    GROUP BY eom
    ORDER BY eom
    """,
    """
    SELECT CAST(last_day(o_orderdate) AS DATE) AS eom, count(*) AS n
    FROM orders
    WHERE o_orderdate < DATE '1995-01-01' + INTERVAL 3 MONTH
    GROUP BY 1
    ORDER BY eom
    """,
    ("orders",),
)

# Math wave-2 under oracle: zero-safe integer division bucketing plus the
# NULL-propagating greatest contract exercised through an aggregate.
_ch(
    "chsql_math_wave2",
    """
    SELECT intDivOrZero(o_orderkey, 32) AS bucket,
           count() AS n,
           greatest(max(o_totalprice), 0.0) AS top_price
    FROM orders
    WHERE o_orderkey < 1000
    GROUP BY bucket
    ORDER BY bucket
    """,
    """
    SELECT CAST(o_orderkey // 32 AS BIGINT) AS bucket,
           count(*) AS n,
           greatest(max(o_totalprice), 0.0) AS top_price
    FROM orders
    WHERE o_orderkey < 1000
    GROUP BY 1
    ORDER BY bucket
    """,
    ("orders",),
)

# --- block-order ("running") functions, pinned by an explicit ORDER BY ------
# The monitoring-dashboard idioms: runningDifference / neighbor /
# nonNegativeDerivative / runningAccumulate depend on ClickHouse block order,
# so the translator refuses them UNLESS the SELECT carries a top-level
# ORDER BY — then they rewrite to lag/lead/sum windows over that ordering
# (functions/ch_sql.py _rewrite_running_funcs). Both engines evaluate the
# identical IEEE expression sequence, so doubles hash-match unrounded.

_ch(
    "chsql_running_difference",
    """
    SELECT event_id, runningDifference(value) AS dv
    FROM events
    WHERE user_id < 20
    ORDER BY ts, event_id
    """,
    """
    SELECT event_id,
           coalesce(value - lag(value) OVER (ORDER BY ts, event_id), 0.0) AS dv
    FROM events
    WHERE user_id < 20
    ORDER BY ts, event_id
    """,
    ("events",),
)

_ch(
    "chsql_neighbor",
    """
    SELECT event_id,
           neighbor(value, -1, 0.0) AS prev_v,
           neighbor(value, 2, -1.0) AS next2_v
    FROM events
    WHERE user_id < 20
    ORDER BY ts, event_id
    """,
    """
    SELECT event_id,
           lag(value, 1, 0.0) OVER (ORDER BY ts, event_id) AS prev_v,
           lead(value, 2, -1.0) OVER (ORDER BY ts, event_id) AS next2_v
    FROM events
    WHERE user_id < 20
    ORDER BY ts, event_id
    """,
    ("events",),
)

_ch(
    "chsql_nonnegative_derivative",
    """
    SELECT event_id, nonNegativeDerivative(value, ts) AS rate
    FROM events
    WHERE user_id < 20
    ORDER BY ts, event_id
    """,
    """
    SELECT event_id,
           greatest(0.0, coalesce(
               (value - lag(value) OVER (ORDER BY ts, event_id)) * 1.0
               / nullif((epoch_us(ts) - lag(epoch_us(ts))
                         OVER (ORDER BY ts, event_id)) / 1000000.0, 0.0),
               0.0)) AS rate
    FROM events
    WHERE user_id < 20
    ORDER BY ts, event_id
    """,
    ("events",),
)

# toDecimal64 inside the state: a DOUBLE running sum is FP-order-sensitive
# (DuckDB windows aggregate via segment tree, Spark sequentially) — decimal
# accumulation is exact and order-free on both engines.
_ch(
    "chsql_running_accumulate",
    """
    SELECT event_id,
           toFloat64(
               runningAccumulate(sumState(toDecimal64(value, 2)), user_id)
           ) AS cum
    FROM events
    WHERE user_id < 20
    ORDER BY user_id, ts, event_id
    """,
    """
    SELECT event_id,
           CAST(sum(CAST(value AS DECIMAL(18, 2)))
               OVER (PARTITION BY user_id
                     ORDER BY user_id, ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS cum
    FROM events
    WHERE user_id < 20
    ORDER BY user_id, ts, event_id
    """,
    ("events",),
)

# numbers() table function → Spark range(): the synthetic-axis idiom
# (date spines for gap-free reporting). number is UInt64 in ClickHouse →
# BIGINT here; Spark date arithmetic needs INT, so the idiomatic text
# carries toInt32 — ClickHouse accepts the same cast.
_ch(
    "chsql_numbers_date_spine",
    """
    SELECT number AS n,
           toDate('1995-01-01') + toInt32(number) AS day,
           toDayOfWeek(toDate('1995-01-01') + toInt32(number)) AS dow
    FROM numbers(14)
    ORDER BY n
    """,
    """
    SELECT range AS n,
           DATE '1995-01-01' + CAST(range AS INT) AS day,
           isodow(DATE '1995-01-01' + CAST(range AS INT)) AS dow
    FROM range(14)
    ORDER BY n
    """,
    (),
)

# Single-evaluation guarded forms + tuple-returning sumCount under oracle:
# moduloOrZero with a genuinely zero divisor, ifNotFinite over an IEEE inf
# from divide(), sumCount dot-accessed per the named_struct tuple policy.
_ch(
    "chsql_guarded_math_probe",
    """
    SELECT user_id % 7 AS grp,
           toFloat64(sumCount(toDecimal64(value, 2)).sum) AS v_sum,
           sumCount(value).count AS v_cnt,
           moduloOrZero(max(event_id), count() - count()) AS mz,
           ifNotFinite(divide(1.0, 0.0), -1.0) AS nf
    FROM events
    GROUP BY grp
    ORDER BY grp
    """,
    """
    SELECT user_id % 7 AS grp,
           CAST(SUM(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS v_sum,
           COUNT(value) AS v_cnt,
           CAST(0 AS BIGINT) AS mz,
           -1.0 AS nf
    FROM events
    GROUP BY 1
    ORDER BY grp
    """,
    ("events",),
)

# --- round 9: the remaining block-order aggregate family ---------------------
# groupArrayMovingSum/Avg unroll ClickHouse's array result to one row per
# input row (element i IS the window value at block row i — docs/CHSQL.md);
# deltaSum/deltaSumTimestamp keep the aggregate shape via a derived
# clamped-delta subquery. Float discipline: decimal accumulation for the
# windowed sums (DuckDB segment-tree vs Spark sequential FP order), integral
# BIGINT input for the double movingAvg (integer sums are FP-exact in any
# order, the /4 is dyadic), final columns cast to DOUBLE on both sides.

_ch(
    "chsql_moving_sum",
    """
    SELECT event_id,
           toFloat64(groupArrayMovingSum(3)(toDecimal64(value, 2))) AS ms
    FROM events
    WHERE user_id < 20
    ORDER BY ts, event_id
    """,
    """
    SELECT event_id,
           CAST(sum(CAST(value AS DECIMAL(18, 2)))
               OVER (ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS ms
    FROM events
    WHERE user_id < 20
    ORDER BY ts, event_id
    """,
    ("events",),
)

_ch(
    "chsql_moving_avg",
    """
    SELECT event_id, groupArrayMovingAvg(4)(user_id) AS ma
    FROM events
    WHERE user_id < 20
    ORDER BY ts, event_id
    """,
    """
    SELECT event_id,
           sum(CAST(user_id AS DOUBLE))
               OVER (ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) / 4.0 AS ma
    FROM events
    WHERE user_id < 20
    ORDER BY ts, event_id
    """,
    ("events",),
)

# grouped deltaSum: the top-level ORDER BY only repeats the group key, so
# the pin falls back to the FROM-subquery's ORDER BY — the idiomatic
# ClickHouse way to guarantee block order (ADVICE r8) — and the GROUP BY
# becomes the window PARTITION BY.
_ch(
    "chsql_delta_sum",
    """
    SELECT user_id, toFloat64(deltaSum(toDecimal64(value, 2))) AS d
    FROM (
        SELECT user_id, ts, event_id, value
        FROM events
        WHERE user_id < 50
        ORDER BY user_id, ts, event_id
    )
    GROUP BY user_id
    ORDER BY user_id
    """,
    """
    SELECT user_id, CAST(sum(CASE WHEN dd > 0 THEN dd ELSE CAST(0 AS DECIMAL(18, 2)) END) AS DOUBLE) AS d
    FROM (
        SELECT user_id,
               CAST(value AS DECIMAL(18, 2))
               - lag(CAST(value AS DECIMAL(18, 2)), 1,
                     CAST(value AS DECIMAL(18, 2)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dd
        FROM events
        WHERE user_id < 50
    )
    GROUP BY user_id
    ORDER BY user_id
    """,
    ("events",),
)

# deltaSumTimestamp: under one pinned evaluation its value equals deltaSum
# of the first argument (the timestamp orders STATE MERGES, which a single
# sorted pass never performs) — global aggregate, subquery pin.
_ch(
    "chsql_delta_sum_timestamp",
    """
    SELECT toFloat64(deltaSumTimestamp(toDecimal64(value, 2), ts)) AS d
    FROM (
        SELECT value, ts, event_id
        FROM events
        WHERE user_id < 20
        ORDER BY ts, event_id
    )
    """,
    """
    SELECT CAST(sum(CASE WHEN dd > 0 THEN dd ELSE CAST(0 AS DECIMAL(18, 2)) END) AS DOUBLE) AS d
    FROM (
        SELECT CAST(value AS DECIMAL(18, 2))
               - lag(CAST(value AS DECIMAL(18, 2)), 1,
                     CAST(value AS DECIMAL(18, 2)))
                 OVER (ORDER BY ts, event_id) AS dd
        FROM events
        WHERE user_id < 20
    )
    """,
    ("events",),
)

# the subquery-ORDER-BY pin on a RUNNING function (ADVICE r8 #3): the
# idiomatic ClickHouse shape — ordered subquery inside, running call
# outside — now pins the window instead of refusing.
_ch(
    "chsql_running_diff_subquery_pin",
    """
    SELECT event_id, runningDifference(value) AS dv
    FROM (
        SELECT event_id, ts, value
        FROM events
        WHERE user_id < 20
        ORDER BY ts, event_id
    )
    """,
    """
    SELECT event_id,
           coalesce(value - lag(value) OVER (ORDER BY ts, event_id), 0.0) AS dv
    FROM (
        SELECT event_id, ts, value
        FROM events
        WHERE user_id < 20
    )
    """,
    ("events",),
)

# tuple()/tupleElement(): positional 1-based _N struct fields (the sumCount
# named_struct policy) — grouped as a key, element-accessed, and compared.
_ch(
    "chsql_tuple_group_key",
    """
    SELECT tupleElement(k, 1) AS rf, tupleElement(k, 2) AS ls, cnt
    FROM (
        SELECT tuple(l_returnflag, l_linestatus) AS k, count() AS cnt
        FROM lineitem
        GROUP BY k
    )
    ORDER BY rf, ls
    """,
    """
    SELECT l_returnflag AS rf, l_linestatus AS ls, count(*) AS cnt
    FROM lineitem
    GROUP BY 1, 2
    ORDER BY rf, ls
    """,
    ("lineitem",),
)

_ch(
    "chsql_tuple_compare",
    """
    SELECT count() AS n
    FROM lineitem
    WHERE tuple(l_returnflag, l_linestatus) = tuple('A', 'F')
    """,
    """
    SELECT count(*) AS n
    FROM lineitem
    WHERE l_returnflag = 'A' AND l_linestatus = 'F'
    """,
    ("lineitem",),
)

# multi-array ARRAY JOIN (ClickHouse parallel unnest): posexplode chain
# sharing one position; the WHERE on the unnested aliases proves filter
# composition through the LATERAL VIEW chain.
_ch(
    "chsql_multi_array_join",
    """
    SELECT doc_id, w, toInt64(pos) AS posn
    FROM documents
    ARRAY JOIN splitByChar(' ', text) AS w,
               arrayEnumerate(splitByChar(' ', text)) AS pos
    WHERE doc_id < 10 AND pos <= 3
    ORDER BY doc_id, posn
    """,
    """
    SELECT doc_id, w, CAST(pos AS BIGINT) AS posn
    FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS w,
               unnest(generate_series(1, len(string_split(text, ' '))))
                   AS pos
        FROM documents
        WHERE doc_id < 10
    )
    WHERE pos <= 3
    ORDER BY doc_id, posn
    """,
    ("documents",),
)

# LEFT multi-array form: docs with no match keep one row with NULL
# elements (ClickHouse fills type defaults there — documented NULL-honesty
# divergence, same as the single-array LEFT ARRAY JOIN).
_ch(
    "chsql_multi_array_join_left",
    """
    SELECT doc_id, h, hl
    FROM documents
    LEFT ARRAY JOIN
        arrayFilter(w -> w = 'spark', splitByChar(' ', text)) AS h,
        arrayMap(w -> toInt64(length(w)),
                 arrayFilter(w -> w = 'spark', splitByChar(' ', text))) AS hl
    WHERE doc_id < 30
    ORDER BY doc_id
    """,
    """
    SELECT doc_id, h, hl
    FROM (
        SELECT doc_id,
               unnest(CASE WHEN len(hits) = 0 THEN [NULL] ELSE hits END)
                   AS h,
               unnest(CASE WHEN len(hits) = 0
                      THEN [CAST(NULL AS BIGINT)]
                      ELSE list_transform(hits,
                                          w -> CAST(length(w) AS BIGINT))
                      END) AS hl
        FROM (
            SELECT doc_id,
                   list_filter(string_split(text, ' '),
                               w -> w = 'spark') AS hits
            FROM documents
            WHERE doc_id < 30
        )
    )
    ORDER BY doc_id
    """,
    ("documents",),
)

# pinned groupArray: the ordered-reporting idiom (per order, line numbers
# in ship order). The top-level ORDER BY only repeats the group key, so
# the pin falls back to the FROM-subquery's ORDER BY; the parametric form
# keeps the first N in that order. Serialized to a string so the compare
# is scalar (and exercises arrayStringConcat over the rewritten array).
_ch(
    "chsql_group_array_ordered",
    """
    SELECT l_orderkey,
           arrayStringConcat(groupArray(toString(l_linenumber)), ',')
               AS lines,
           arrayStringConcat(groupArray(2)(toString(l_linenumber)), ',')
               AS lines2
    FROM (
        SELECT l_orderkey, l_linenumber, l_shipdate
        FROM lineitem
        WHERE l_orderkey < 200
        ORDER BY l_orderkey, l_shipdate, l_linenumber
    )
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
    """
    SELECT l_orderkey,
           array_to_string(
               list(CAST(l_linenumber AS VARCHAR)
                    ORDER BY l_shipdate, l_linenumber), ',') AS lines,
           array_to_string(
               (list(CAST(l_linenumber AS VARCHAR)
                     ORDER BY l_shipdate, l_linenumber))[1:2], ',')
               AS lines2
    FROM lineitem
    WHERE l_orderkey < 200
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
    ("lineitem",),
)

# LIMIT offset, n BY (the pagination-per-group form) + arrayFold: skip the
# first line per order, keep the next two, in line order; fold the kept
# quantities with an order-sensitive accumulator to prove the fold order.
_ch(
    "chsql_limit_by_offset",
    """
    SELECT l_orderkey, l_linenumber,
           arrayFold((acc, x) -> acc * 2 + x,
                     arrayMap(i -> toInt64(i), array(l_linenumber)),
                     toInt64(0)) AS folded
    FROM lineitem
    WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    LIMIT 1, 2 BY l_orderkey
    """,
    """
    SELECT l_orderkey, l_linenumber, CAST(l_linenumber AS BIGINT) AS folded
    FROM (
        SELECT l_orderkey, l_linenumber,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber) AS rn
        FROM lineitem
        WHERE l_orderkey < 100
    )
    WHERE rn > 1 AND rn <= 3
    ORDER BY l_orderkey, l_linenumber
    """,
    ("lineitem",),
)

# --- round 10: the map/combinator aggregate tail ---------------------------
# sumMap/minMap/maxMap/avgMap, the -ForEach family, and topK/topKIf now
# TRANSLATE (functions/ch_sql.py _emit_call) instead of refusing: one
# collect-entries-then-fold aggregate expression, composing with any
# GROUP BY / HAVING / sibling aggregate. Maps serialize to 'k:v' strings at
# the output boundary (the ch_summap_daily convention) so the cross-engine
# hash compares scalars, and values pre-scale to integer cents so no float
# sum order can diverge.

# single-map form sumMap(map(k, v)) per day — the SummingMergeTree
# dashboard shape, verbatim ClickHouse text
_ch(
    "chsql_summap_daily",
    """
    SELECT toDate(ts) AS day,
           arrayStringConcat(mapKeys(
               sumMap(map(event_type, toInt64(round(value * 100))))), ',')
               AS ks,
           arrayStringConcat(arrayMap(v -> toString(v), mapValues(
               sumMap(map(event_type, toInt64(round(value * 100)))))), ',')
               AS vs
    FROM events
    WHERE user_id < 200
    GROUP BY day
    ORDER BY day
    """,
    """
    WITH c AS (
      SELECT CAST(ts AS DATE) AS day, event_type AS k,
             SUM(CAST(round(value * 100, 0) AS BIGINT)) AS v
      FROM events WHERE user_id < 200 GROUP BY 1, 2)
    SELECT day,
           array_to_string(list(k ORDER BY k), ',') AS ks,
           array_to_string(list(CAST(v AS VARCHAR) ORDER BY k), ',') AS vs
    FROM c GROUP BY day ORDER BY day
    """,
    ("events",),
)

# two-array form minMap/maxMap(keys, values) — per weekday, the min and max
# scaled value each event type reached
_ch(
    "chsql_minmax_map_weekday",
    """
    SELECT toDayOfWeek(ts) AS dow,
           arrayStringConcat(arrayMap(v -> toString(v), mapValues(
               minMap(array(event_type),
                      array(toInt64(round(value * 100)))))), ',') AS mins,
           arrayStringConcat(arrayMap(v -> toString(v), mapValues(
               maxMap(array(event_type),
                      array(toInt64(round(value * 100)))))), ',') AS maxs
    FROM events
    WHERE user_id < 300
    GROUP BY dow
    ORDER BY dow
    """,
    """
    WITH c AS (
      SELECT isodow(ts) AS dow, event_type AS k,
             MIN(CAST(round(value * 100, 0) AS BIGINT)) AS mn,
             MAX(CAST(round(value * 100, 0) AS BIGINT)) AS mx
      FROM events WHERE user_id < 300 GROUP BY 1, 2)
    SELECT dow,
           array_to_string(list(CAST(mn AS VARCHAR) ORDER BY k), ',') AS mins,
           array_to_string(list(CAST(mx AS VARCHAR) ORDER BY k), ',') AS maxs
    FROM c GROUP BY dow ORDER BY dow
    """,
    ("events",),
)

# topK / topKIf — most frequent event types per user bucket, overall and
# among high-value events only. The translation counts EXACTLY with ties
# broken by value ascending (deterministic superset of ClickHouse's
# approximate sketch; docs/CHSQL.md).
_ch(
    "chsql_topk_event_types",
    """
    SELECT user_id % 10 AS bucket,
           arrayStringConcat(topK(3)(event_type), ',') AS top3,
           arrayStringConcat(topKIf(2)(event_type, value > 250), ',')
               AS top2_high
    FROM events
    GROUP BY bucket
    ORDER BY bucket
    """,
    """
    WITH ranked AS (
      SELECT user_id % 10 AS bucket, event_type,
             row_number() OVER (PARTITION BY user_id % 10
                                ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY 1, 2),
    ranked_hi AS (
      SELECT user_id % 10 AS bucket, event_type,
             row_number() OVER (PARTITION BY user_id % 10
                                ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events WHERE value > 250 GROUP BY 1, 2)
    SELECT r.bucket,
           (SELECT array_to_string(list(event_type ORDER BY rn), ',')
            FROM ranked x WHERE x.bucket = r.bucket AND x.rn <= 3) AS top3,
           coalesce((SELECT array_to_string(list(event_type ORDER BY rn), ',')
            FROM ranked_hi y WHERE y.bucket = r.bucket AND y.rn <= 2), '')
               AS top2_high
    FROM (SELECT DISTINCT bucket FROM ranked) r
    ORDER BY r.bucket
    """,
    ("events",),
)

# sumForEach over ragged integer arrays built from lineitem columns —
# element-wise sums per position up to the longest array (ClickHouse's
# ragged contract: shorter arrays don't contribute at tail positions)
_ch(
    "chsql_sum_foreach_lineitem",
    """
    SELECT l_returnflag,
           arrayStringConcat(arrayMap(v -> toString(v), sumForEach(
               arraySlice(array(toInt64(l_quantity), toInt64(l_linenumber),
                                toInt64(l_suppkey % 7)),
                          1, 1 + (l_orderkey % 3)))), ',') AS sums
    FROM lineitem
    WHERE l_orderkey < 2000
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    """
    WITH base AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS e1,
             CASE WHEN 1 + (l_orderkey % 3) >= 2
                  THEN CAST(l_linenumber AS BIGINT) END AS e2,
             CASE WHEN 1 + (l_orderkey % 3) >= 3
                  THEN CAST(l_suppkey % 7 AS BIGINT) END AS e3
      FROM lineitem WHERE l_orderkey < 2000)
    SELECT l_returnflag,
           concat_ws(',', CAST(SUM(e1) AS VARCHAR),
                          CAST(SUM(e2) AS VARCHAR),
                          CAST(SUM(e3) AS VARCHAR)) AS sums
    FROM base GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    ("lineitem",),
)

# grouped groupArrayMovingSum/Avg (round 10): the delta-style restructure —
# GROUP BY → window PARTITION BY, per-group array re-collected in pin order
# (ClickHouse's true result shape, unlike the ungrouped per-row unroll).
# Values pre-scaled to integer cents; arrays serialized at the boundary.
_ch(
    "chsql_moving_sum_grouped",
    """
    SELECT user_id,
           arrayStringConcat(arrayMap(v -> toString(v),
               groupArrayMovingSum(3)(toInt64(round(value * 100)))), ',')
               AS ms3,
           arrayStringConcat(arrayMap(v -> toString(v),
               groupArrayMovingSum(toInt64(round(value * 100)))), ',')
               AS cs
    FROM (
        SELECT user_id, ts, event_id, value
        FROM events
        WHERE user_id < 40
        ORDER BY user_id, ts, event_id
    )
    GROUP BY user_id
    ORDER BY user_id
    """,
    """
    WITH w AS (
      SELECT user_id, ts, event_id,
             SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                 AS ms3,
             SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cs
      FROM (SELECT user_id, ts, event_id,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents
            FROM events WHERE user_id < 40))
    SELECT user_id,
           array_to_string(list(CAST(ms3 AS VARCHAR)
                                ORDER BY ts, event_id), ',') AS ms3,
           array_to_string(list(CAST(cs AS VARCHAR)
                                ORDER BY ts, event_id), ',') AS cs
    FROM w GROUP BY user_id ORDER BY user_id
    """,
    ("events",),
)

# uniqUpTo / topKWeighted / anyHeavy (round 10): the last refused
# aggregate-sketch trio, translated exactly — uniqUpTo(N) IS
# least(distinct count, N+1) by its definition; topKWeighted ranks by
# exact total weight; anyHeavy is the deterministic exact mode.
_ch(
    "chsql_uniq_upto_topk_weighted",
    """
    SELECT user_id % 10 AS bucket,
           uniqUpTo(3)(event_type) AS u3,
           anyHeavy(event_type) AS heavy,
           arrayStringConcat(
               topKWeighted(2)(event_type, toInt64(round(value * 100))),
               ',') AS tw2
    FROM events
    GROUP BY bucket
    ORDER BY bucket
    """,
    """
    WITH ranked AS (
      SELECT user_id % 10 AS bucket, event_type,
             row_number() OVER (PARTITION BY user_id % 10
                                ORDER BY SUM(CAST(round(value * 100, 0)
                                              AS BIGINT)) DESC,
                                         event_type) AS rnw,
             row_number() OVER (PARTITION BY user_id % 10
                                ORDER BY COUNT(*) DESC, event_type) AS rnc
      FROM events GROUP BY 1, 2)
    SELECT b.bucket,
           least(b.nd, 4) AS u3,
           (SELECT event_type FROM ranked x
            WHERE x.bucket = b.bucket AND x.rnc = 1) AS heavy,
           (SELECT array_to_string(list(event_type ORDER BY rnw), ',')
            FROM ranked y WHERE y.bucket = b.bucket AND y.rnw <= 2) AS tw2
    FROM (SELECT user_id % 10 AS bucket,
                 CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nd
          FROM events GROUP BY 1) b
    ORDER BY b.bucket
    """,
    ("events",),
)

# bracket grammar (round 10): ClickHouse [a, b] array literals (→ array())
# and 1-BASED element access with negative-from-the-end (→
# try_element_at; Spark's own subscript is 0-based — the passthrough was
# a silent off-by-one on every subscript).
#
# Honesty note on the `oob` column: real ClickHouse fills out-of-range /
# missing-key access with the element type's DEFAULT (0 / ''), while this
# repo's documented posture (docs/CHSQL.md) is try_element_at's NULL. The
# oracle below bakes that SAME NULL posture into the DuckDB text — so this
# query verifies the translator's internal consistency, NOT ClickHouse
# parity on the out-of-range case; don't read a green here as CH
# default-fill behavior.
_ch(
    "chsql_bracket_literals_access",
    """
    SELECT l_orderkey,
           [toInt64(l_quantity), toInt64(l_linenumber)][1] AS qty_first,
           [toInt64(l_quantity), toInt64(l_linenumber)][-1] AS line_last,
           splitByChar('#', 'a#b#c')[2] AS mid,
           [toInt64(l_partkey)][5] AS oob
    FROM lineitem
    WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
    """
    SELECT l_orderkey,
           CAST(l_quantity AS BIGINT) AS qty_first,
           CAST(l_linenumber AS BIGINT) AS line_last,
           'b' AS mid,
           CAST(NULL AS BIGINT) AS oob
    FROM lineitem
    WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
    ("lineitem",),
)

# GROUP BY … WITH ROLLUP / CUBE / TOTALS (round 11 — the last clause-level
# refusal family, now translated). Subtotal-row keys carry ClickHouse's
# TYPE DEFAULTS (0 / '' / epoch), not Spark's NULLs: every select-listed
# key is wrapped in CASE WHEN grouping(k)=1 THEN <default> ELSE k END, and
# the structural rewrite always emits the explicit ROLLUP()/CUBE()/
# GROUPING SETS form (Spark 4.1.2's trailing `a, b WITH ROLLUP` form drops
# rows in some shapes — functions/ch_sql.py block comment). The oracles
# spell the same grouping()-guarded defaults in DuckDB. Note the totals /
# subtotal rows MAY collide with genuine key values (a real bucket 0 and
# the totals row both read 0) — exactly ClickHouse's own ambiguity.
#
# chsql_rollup_status_priority: BARE-COLUMN string keys — exercises the
# analyzed-probe typing path in run_ch_sql (text typing cannot see a bare
# column's type).
_ch(
    "chsql_rollup_status_priority",
    """
    SELECT o_orderstatus AS st, o_orderpriority AS pri,
           count() AS c,
           sum(toInt64(round(o_totalprice))) AS tp
    FROM orders
    WHERE o_orderkey < 30000
    GROUP BY st, pri WITH ROLLUP
    ORDER BY st, pri, c
    """,
    """
    SELECT CASE WHEN grouping(o_orderstatus) = 1 THEN ''
                ELSE o_orderstatus END AS st,
           CASE WHEN grouping(o_orderpriority) = 1 THEN ''
                ELSE o_orderpriority END AS pri,
           count(*) AS c,
           sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS tp
    FROM orders
    WHERE o_orderkey < 30000
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    ORDER BY st, pri, c
    """,
    ("orders",),
)

# chsql_rollup_year_month: computed int keys — fully TEXT-typed, so the
# standalone translate_ch_sql path handles it without a session (the
# golden suite locks the emitted shape).
_ch(
    "chsql_rollup_year_month",
    """
    SELECT toYear(o_orderdate) AS y, toMonth(o_orderdate) AS m,
           count() AS c,
           sum(toInt64(round(o_totalprice * 100))) AS cents
    FROM orders
    WHERE o_orderkey < 20000
    GROUP BY y, m WITH ROLLUP
    ORDER BY y, m, c
    """,
    """
    SELECT CASE WHEN grouping(year(o_orderdate)) = 1 THEN 0
                ELSE CAST(year(o_orderdate) AS INT) END AS y,
           CASE WHEN grouping(month(o_orderdate)) = 1 THEN 0
                ELSE CAST(month(o_orderdate) AS INT) END AS m,
           count(*) AS c,
           sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
    FROM orders
    WHERE o_orderkey < 20000
    GROUP BY ROLLUP(year(o_orderdate), month(o_orderdate))
    ORDER BY y, m, c
    """,
    ("orders",),
)

# chsql_cube_year_status: CUBE over a computed int key and a bare string
# key — all four grouping sets, mixed text/probe typing in one clause.
_ch(
    "chsql_cube_year_status",
    """
    SELECT toYear(o_orderdate) AS y, o_orderstatus AS st, count() AS c
    FROM orders
    WHERE o_orderkey < 20000
    GROUP BY y, st WITH CUBE
    ORDER BY y, st, c
    """,
    """
    SELECT CASE WHEN grouping(year(o_orderdate)) = 1 THEN 0
                ELSE CAST(year(o_orderdate) AS INT) END AS y,
           CASE WHEN grouping(o_orderstatus) = 1 THEN ''
                ELSE o_orderstatus END AS st,
           count(*) AS c
    FROM orders
    WHERE o_orderkey < 20000
    GROUP BY CUBE(year(o_orderdate), o_orderstatus)
    ORDER BY y, st, c
    """,
    ("orders",),
)

# chsql_rollup_with_totals (round 12): ROLLUP … WITH TOTALS — the totals
# row is the rollup's own grand-total grouping set, so the union of sets
# dedups to plain ROLLUP: the grand-total row appears exactly once.
_ch(
    "chsql_rollup_with_totals",
    """
    SELECT o_orderstatus AS st, o_orderpriority AS pri,
           count() AS c,
           sum(toInt64(round(o_totalprice))) AS tp
    FROM orders
    WHERE o_orderkey < 30000
    GROUP BY ROLLUP(st, pri) WITH TOTALS
    ORDER BY st, pri, c
    """,
    """
    SELECT CASE WHEN grouping(o_orderstatus) = 1 THEN ''
                ELSE o_orderstatus END AS st,
           CASE WHEN grouping(o_orderpriority) = 1 THEN ''
                ELSE o_orderpriority END AS pri,
           count(*) AS c,
           sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS tp
    FROM orders
    WHERE o_orderkey < 30000
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    ORDER BY st, pri, c
    """,
    ("orders",),
)

# chsql_totals_limit (round 12): WITH TOTALS + LIMIT — ClickHouse's totals
# block is exempt from LIMIT and computed over the UNLIMITED input; the
# rewrite LIMITs the plain rows and UNION ALLs one all-keys-defaulted
# totals row, so the totals row never displaces a data row in the LIMIT.
_ch(
    "chsql_totals_limit",
    """
    SELECT o_orderpriority AS pri,
           count() AS c,
           sum(toInt64(round(o_totalprice))) AS tp
    FROM orders
    WHERE o_orderkey < 30000
    GROUP BY pri WITH TOTALS
    ORDER BY c DESC, pri LIMIT 3
    """,
    """
    SELECT * FROM (
      SELECT o_orderpriority AS pri, count(*) AS c,
             sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS tp
      FROM orders WHERE o_orderkey < 30000
      GROUP BY 1 ORDER BY c DESC, pri LIMIT 3)
    UNION ALL
    SELECT '' AS pri, count(*) AS c,
           sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS tp
    FROM orders WHERE o_orderkey < 30000
    """,
    ("orders",),
)

# chsql_limit_with_ties (round 12): LIMIT n WITH TIES → rank()-bounded
# window (first n rows plus every row tied with the n-th on the ORDER BY
# fields). Ties on the low-cardinality status column make the kept SET
# deterministic even though the row order inside a tie group is not.
_ch(
    "chsql_limit_with_ties",
    """
    SELECT o_orderstatus AS st, o_orderpriority AS pri
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY st LIMIT 5 WITH TIES
    """,
    """
    SELECT st, pri FROM (
      SELECT o_orderstatus AS st, o_orderpriority AS pri,
             rank() OVER (ORDER BY o_orderstatus) AS r
      FROM orders WHERE o_orderkey < 2000)
    WHERE r <= 5 ORDER BY st
    """,
    ("orders",),
)

# chsql_colon_cast_offset_fetch (round 12): the ``::Type`` cast operator
# and the ANSI OFFSET/FETCH forms ClickHouse accepts, over an ordered
# unique key so the page is deterministic.
_ch(
    "chsql_colon_cast_offset_fetch",
    """
    SELECT o_orderkey::String AS k, o_totalprice::Int64 AS p
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    OFFSET 2 ROWS FETCH NEXT 5 ROWS ONLY
    """,
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS k,
           CAST(trunc(o_totalprice) AS BIGINT) AS p  -- CH toInt64 truncates
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    LIMIT 5 OFFSET 2
    """,
    ("orders",),
)

# chsql_array_combinators (round 12): -Array aggregate combinators over
# the embeddings vectors — the aggregate applies to ALL elements across
# the group's arrays. sumArray rounds to 6dp (double fold order differs
# between engines — the cross-engine float discipline).
_ch(
    "chsql_array_combinators",
    """
    SELECT vec_id % 4 AS bucket,
           round(sumArray(embedding), 6) AS s,
           countArray(embedding) AS c,
           round(minArray(embedding), 6) AS mn,
           round(maxArray(embedding), 6) AS mx
    FROM embeddings
    WHERE vec_id < 400
    GROUP BY bucket
    ORDER BY bucket
    """,
    """
    SELECT vec_id % 4 AS bucket,
           round(sum(list_aggregate(embedding, 'sum')), 6) AS s,
           sum(len(embedding)) AS c,
           round(min(list_aggregate(embedding, 'min')), 6) AS mn,
           round(max(list_aggregate(embedding, 'max')), 6) AS mx
    FROM embeddings
    WHERE vec_id < 400
    GROUP BY 1
    ORDER BY bucket
    """,
    ("embeddings",),
)

# chsql_tokenizers (round 12): alphaTokens / tokens (maximal class runs,
# empties dropped) and character ngrams over document text — DuckDB twins
# via str_split_regex + list_filter and a list_transform over range().
_ch(
    "chsql_tokenizers",
    """
    SELECT doc_id,
           arrayStringConcat(alphaTokens(substring(text, 1, 40)), '|') AS at,
           arrayStringConcat(tokens(substring(text, 1, 40)), '|') AS tk,
           arrayStringConcat(ngrams(substring(text, 1, 12), 3), '|') AS ng
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
    """
    SELECT doc_id,
           array_to_string(list_filter(
             str_split_regex(substring(text, 1, 40), '[^A-Za-z]+'),
             x -> x != ''), '|') AS at,
           array_to_string(list_filter(
             str_split_regex(substring(text, 1, 40), '[^A-Za-z0-9]+'),
             x -> x != ''), '|') AS tk,
           array_to_string(list_transform(
             range(1, greatest(length(substring(text, 1, 12)) - 2, 0) + 1),
             i -> substring(substring(text, 1, 12), CAST(i AS INT), 3)),
             '|') AS ng
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
    ("documents",),
)

# chsql_url_functions (round 12): the URL family over URLs synthesized
# from fixture columns — the oracle CONSTRUCTS each expected part
# directly, so this checks the try_parse_url-based parsing against
# ground truth rather than against another parser.
_ch(
    "chsql_url_functions",
    """
    SELECT doc_id,
           domain(u) AS dm,
           pathFull(u) AS pf,
           extractURLParameter(u, 'id') AS pid,
           extractURLParameter(u, 'zz') AS pzz,
           topLevelDomain(u) AS tld,
           cutQueryString(u) AS cq,
           netloc(u) AS nl
    FROM (SELECT doc_id,
                 concat('https://www.ex', toString(doc_id % 7),
                        '.com/p/', lang, '?q=', source,
                        '&id=', toString(doc_id)) AS u
          FROM documents WHERE doc_id < 60)
    ORDER BY doc_id
    """,
    """
    SELECT doc_id,
           'www.ex' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS dm,
           '/p/' || lang || '?q=' || source || '&id=' ||
             CAST(doc_id AS VARCHAR) AS pf,
           CAST(doc_id AS VARCHAR) AS pid,
           '' AS pzz,
           'com' AS tld,
           'https://www.ex' || CAST(doc_id % 7 AS VARCHAR) ||
             '.com/p/' || lang AS cq,
           'www.ex' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS nl
    FROM documents WHERE doc_id < 60
    ORDER BY doc_id
    """,
    ("documents",),
)

# chsql_totals_bucket: WITH TOTALS → GROUPING SETS ((keys), ()) — the
# plain GROUP BY rows plus ONE totals row whose key carries the type
# default (0 — colliding with the real bucket 0, as in ClickHouse).
_ch(
    "chsql_totals_bucket",
    """
    SELECT user_id % 10 AS bucket,
           count() AS c,
           uniqExact(event_type) AS types
    FROM events
    GROUP BY bucket WITH TOTALS
    ORDER BY bucket, c
    """,
    """
    SELECT CASE WHEN grouping(user_id % 10) = 1 THEN 0
                ELSE user_id % 10 END AS bucket,
           count(*) AS c,
           CAST(count(DISTINCT event_type) AS BIGINT) AS types
    FROM events
    GROUP BY GROUPING SETS ((user_id % 10), ())
    ORDER BY bucket, c
    """,
    ("events",),
)

# count-combinator restructure with sibling aggregates (round 11): the
# SELECT lowers to the two-level GROUP BY form — inner per-(bucket, type)
# counts, outer folds the pairs — while count/sum/min/max siblings merge
# through partials (count → sum of partial counts, etc.). The oracle
# computes the same semantics relationally.
_ch(
    "chsql_topk_with_siblings",
    """
    SELECT user_id % 10 AS bucket,
           arrayStringConcat(topK(2)(event_type), ',') AS top2,
           count() AS c,
           uniqExact(event_type) AS types,
           sum(toInt64(round(value * 100))) AS cents,
           min(toInt64(round(value * 100))) AS mn,
           max(toInt64(round(value * 100))) AS mx
    FROM events
    GROUP BY bucket
    ORDER BY bucket
    """,
    """
    WITH ranked AS (
      SELECT user_id % 10 AS bucket, event_type,
             row_number() OVER (PARTITION BY user_id % 10
                                ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY 1, 2)
    SELECT b.bucket,
           (SELECT array_to_string(list(event_type ORDER BY rn), ',')
            FROM ranked x WHERE x.bucket = b.bucket AND x.rn <= 2) AS top2,
           b.c, b.types, b.cents, b.mn, b.mx
    FROM (SELECT user_id % 10 AS bucket, count(*) AS c,
                 CAST(count(DISTINCT event_type) AS BIGINT) AS types,
                 sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents,
                 min(CAST(round(value * 100, 0) AS BIGINT)) AS mn,
                 max(CAST(round(value * 100, 0) AS BIGINT)) AS mx
          FROM events GROUP BY 1) b
    ORDER BY b.bucket
    """,
    ("events",),
)

# count(DISTINCT <shared value>) sibling (round 12): the DISTINCT-spelled
# exact unique count over the combinators' own value expression decomposes
# to a conditional count of the inner per-(bucket, value) rows — the
# SELECT stays on the linear two-level form instead of falling back to the
# O(distinct × rows) collect form (round-11 verdict #3).
_ch(
    "chsql_topk_with_uniq",
    """
    SELECT user_id % 10 AS bucket,
           arrayStringConcat(topK(2)(event_type), ',') AS top2,
           count(DISTINCT event_type) AS types,
           count() AS c
    FROM events
    GROUP BY bucket
    ORDER BY bucket
    """,
    """
    WITH ranked AS (
      SELECT user_id % 10 AS bucket, event_type,
             row_number() OVER (PARTITION BY user_id % 10
                                ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY 1, 2)
    SELECT b.bucket,
           (SELECT array_to_string(list(event_type ORDER BY rn), ',')
            FROM ranked x WHERE x.bucket = b.bucket AND x.rn <= 2) AS top2,
           b.types, b.c
    FROM (SELECT user_id % 10 AS bucket,
                 CAST(count(DISTINCT event_type) AS BIGINT) AS types,
                 count(*) AS c
          FROM events GROUP BY 1) b
    ORDER BY b.bucket
    """,
    ("events",),
)

# entropy (round 10): Shannon entropy in bits over exact counts; rounded
# to 6dp in BOTH texts (the distinct-value fold order differs between
# engines, so the last float bits may — the cross-engine discipline).
_ch(
    "chsql_entropy_event_types",
    """
    SELECT user_id % 10 AS bucket,
           round(entropy(event_type), 6) AS h
    FROM events
    GROUP BY bucket
    ORDER BY bucket
    """,
    """
    SELECT user_id % 10 AS bucket, round(entropy(event_type), 6) AS h
    FROM events GROUP BY 1 ORDER BY 1
    """,
    ("events",),
)

# --- round 11: map HOFs, two-array HOFs, indexed format / scaled trunc /
# multi-month toStartOfInterval -----------------------------------------
# mapApply/mapExists/mapAll translate via zip_with(map_keys, map_values,
# <original lambda>) — the two-parameter lambda applies unchanged, no
# identifier surgery (functions/ch_sql.py _emit_call). Maps serialize to
# joined strings at the output boundary (the ch_summap_daily convention).
_ch(
    "chsql_map_hofs",
    """
    SELECT uid,
           arrayStringConcat(mapKeys(
               mapApply((k, v) -> tuple(concat(k, '#'), v), m)), ',') AS ks,
           arrayStringConcat(arrayMap(v -> toString(v), mapValues(
               mapApply((k, v) -> tuple(k, v * 2), m))), ',') AS vs,
           toInt64(if(mapExists((k, v) -> v >= 3, m), 1, 0)) AS has_hot,
           toInt64(if(mapAll((k, v) -> v >= 2, m), 1, 0)) AS all_warm
    FROM (SELECT user_id AS uid,
                 sumMap(map(event_type, toInt64(1))) AS m
          FROM events WHERE user_id < 60 GROUP BY uid)
    ORDER BY uid
    """,
    """
    WITH c AS (
      SELECT user_id AS uid, event_type AS k, COUNT(*) AS v
      FROM events WHERE user_id < 60 GROUP BY 1, 2)
    SELECT uid,
           array_to_string(list(k || '#' ORDER BY k), ',') AS ks,
           array_to_string(list(CAST(v * 2 AS VARCHAR) ORDER BY k), ',')
               AS vs,
           CAST(max(CASE WHEN v >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS has_hot,
           CAST(min(CASE WHEN v >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS all_warm
    FROM c GROUP BY uid ORDER BY uid
    """,
    ("events",),
)

# two-array HOFs (zip_with): per-row element-wise compare/multiply between
# two constructed arrays, aggregated per return flag. arrayFilter keeps
# elements of the FIRST array — the lt_sum column proves that contract.
_ch(
    "chsql_two_array_hofs",
    """
    SELECT l_returnflag,
           sum(toInt64(arrayCount((x, y) -> x > y, a, b))) AS gt_cnt,
           toInt64(sum(arraySum(arrayMap((x, y) -> x * y, a, b)))) AS dot,
           countIf(arrayExists((x, y) -> x = y, a, b)) AS eq_rows,
           toInt64(sum(arraySum(arrayFilter((x, y) -> x < y, a, b))))
               AS lt_sum,
           countIf(arrayAll((x, y) -> x <= y + 50, a, b)) AS all_near
    FROM (SELECT l_returnflag,
                 array(toInt64(l_quantity), toInt64(l_linenumber)) AS a,
                 array(toInt64(l_partkey % 50), toInt64(l_suppkey % 10)) AS b
          FROM lineitem WHERE l_orderkey < 4000)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    """
    WITH base AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS a1,
             CAST(l_linenumber AS BIGINT) AS a2,
             CAST(l_partkey % 50 AS BIGINT) AS b1,
             CAST(l_suppkey % 10 AS BIGINT) AS b2
      FROM lineitem WHERE l_orderkey < 4000)
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN a1 > b1 THEN 1 ELSE 0 END
                  + CASE WHEN a2 > b2 THEN 1 ELSE 0 END) AS BIGINT) AS gt_cnt,
           CAST(SUM(a1 * b1 + a2 * b2) AS BIGINT) AS dot,
           CAST(SUM(CASE WHEN a1 = b1 OR a2 = b2 THEN 1 ELSE 0 END)
                AS BIGINT) AS eq_rows,
           CAST(SUM(CASE WHEN a1 < b1 THEN a1 ELSE 0 END
                  + CASE WHEN a2 < b2 THEN a2 ELSE 0 END) AS BIGINT) AS lt_sum,
           CAST(SUM(CASE WHEN a1 <= b1 + 50 AND a2 <= b2 + 50 THEN 1 ELSE 0
                    END) AS BIGINT) AS all_near
    FROM base GROUP BY 1 ORDER BY 1
    """,
    ("lineitem",),
)

# indexed format() placeholders (%n$s positional), scaled trunc (toward
# zero), and multi-month toStartOfInterval (months-since-epoch alignment).
# trunc applies to MIN/MAX — order-independent exact doubles, so both
# engines truncate the identical product (the cross-engine float
# discipline).
_ch(
    "chsql_format_trunc_interval",
    """
    SELECT toStartOfInterval(o_orderdate, INTERVAL 2 month) AS bucket,
           format('{1}|{0}', toString(count()), o_orderpriority) AS label,
           trunc(min(o_totalprice), 2) AS min_t2,
           trunc(max(o_totalprice), -2) AS max_down
    FROM orders
    WHERE o_custkey < 500
    GROUP BY bucket, o_orderpriority
    ORDER BY bucket, label
    """,
    """
    SELECT (DATE '1970-01-01' + to_months(CAST(
               floor(((year(o_orderdate) - 1970) * 12
                      + month(o_orderdate) - 1) / 2) * 2 AS INT))) AS bucket,
           o_orderpriority || '|' || CAST(COUNT(*) AS VARCHAR) AS label,
           trunc(min(o_totalprice) * 100) / 100 AS min_t2,
           trunc(max(o_totalprice) / 100) * 100 AS max_down
    FROM orders
    WHERE o_custkey < 500
    GROUP BY 1, o_orderpriority
    ORDER BY bucket, label
    """,
    ("orders",),
)

# ANY LEFT JOIN (round 11): strictness translates to a row_number window
# over the pinned right subquery — each customer joined to its single
# latest order (date DESC, orderkey tiebreak), verbatim ClickHouse text.
_ch(
    "chsql_any_join_latest_order",
    """
    SELECT c_custkey, c_name,
           o.o_orderdate AS last_order_date,
           o.o_totalprice AS last_price
    FROM customer
    ANY LEFT JOIN (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
                   FROM orders
                   ORDER BY o_orderdate DESC, o_orderkey) AS o
        ON customer.c_custkey = o.o_custkey
    WHERE c_custkey < 400
    ORDER BY c_custkey
    """,
    """
    WITH r AS (
      SELECT o_custkey, o_orderdate, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey) AS rn
      FROM orders)
    SELECT c_custkey, c_name,
           r.o_orderdate AS last_order_date,
           r.o_totalprice AS last_price
    FROM customer LEFT JOIN r ON c_custkey = r.o_custkey AND r.rn = 1
    WHERE c_custkey < 400
    ORDER BY c_custkey
    """,
    ("customer", "orders"),
)

# replaceRegexpOne first-match splice + two-array element pickers (round
# 11b). DuckDB's regexp_replace is first-match-only without the 'g' flag —
# a direct oracle for ClickHouse's replaceOne semantics. The two-array
# pickers reduce element-wise over constructed arrays; the oracle spells
# the per-position CASE ladder.
_ch(
    "chsql_regexp_one_and_pickers",
    """
    SELECT p_partkey,
           replaceRegexpOne(p_name, '[aeiou]+', '<v>') AS devoweled_once,
           arrayFirst((x, y) -> x > y,
                      array(toInt64(p_size), toInt64(p_size) * 2),
                      array(toInt64(15), toInt64(p_size))) AS first_gt,
           arrayFirstIndex((x, y) -> x = y,
                      array(toInt64(p_size), toInt64(p_size) * 2),
                      array(toInt64(15), toInt64(p_size))) AS eq_idx
    FROM part
    WHERE p_partkey < 600
    ORDER BY p_partkey
    """,
    """
    SELECT p_partkey,
           regexp_replace(p_name, '[aeiou]+', '<v>') AS devoweled_once,
           CASE WHEN p_size > 15 THEN CAST(p_size AS BIGINT)
                WHEN p_size * 2 > p_size THEN CAST(p_size * 2 AS BIGINT)
           END AS first_gt,
           CAST(CASE WHEN p_size = 15 THEN 1
                     WHEN p_size * 2 = p_size THEN 2
                     ELSE 0 END AS BIGINT) AS eq_idx
    FROM part
    WHERE p_partkey < 600
    ORDER BY p_partkey
    """,
    ("part",),
)

# --- round 13 ---------------------------------------------------------------

# chsql_ternary_bands (round 13, verdict r12 #2): the cond ? a : b ternary
# — ClickHouse's lowest-precedence operator — in nested (right-associative)
# banding form, inside an aggregate argument, and with an AND-chain
# condition (the whole chain is the cond). Translates via
# _rewrite_ternaries → CASE WHEN; the oracle spells the CASE directly.
_ch(
    "chsql_ternary_bands",
    """
    SELECT o_orderkey AS k,
           o_totalprice > 200000 ? 'high'
             : o_totalprice > 100000 ? 'mid' : 'low' AS band,
           o_orderstatus = 'F' AND o_totalprice > 150000 ? 1 : 0 AS big_f
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY k
    """,
    """
    SELECT o_orderkey AS k,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS band,
           CASE WHEN o_orderstatus = 'F' AND o_totalprice > 150000
                THEN 1 ELSE 0 END AS big_f
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY k
    """,
    ("orders",),
)

# chsql_ternary_agg (round 13): ternaries inside aggregate arguments —
# the conditional-sum idiom ClickHouse users write instead of sumIf.
_ch(
    "chsql_ternary_agg",
    """
    SELECT o_orderstatus AS st,
           sum(o_totalprice > 150000 ? 1 : 0) AS n_big,
           count() AS c
    FROM orders
    WHERE o_orderkey < 30000
    GROUP BY st
    ORDER BY st
    """,
    """
    SELECT o_orderstatus AS st,
           CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_big,
           count(*) AS c
    FROM orders
    WHERE o_orderkey < 30000
    GROUP BY st
    ORDER BY st
    """,
    ("orders",),
)

# chsql_column_matchers (round 13, verdict r12 #3): the * EXCEPT/REPLACE/
# APPLY modifier chain, expanded in run_ch_sql against the analyzed FROM
# schema (plain EXCEPT is lenient per ClickHouse; names follow the CH
# result header: f(col)). The oracle spells the expansion explicitly with
# matching quoted aliases.
_ch(
    "chsql_column_matchers",
    """
    SELECT * EXCEPT (o_totalprice, o_orderdate)
             REPLACE (lower(o_orderpriority) AS o_orderpriority)
             APPLY(uniqExact)
    FROM orders
    WHERE o_orderkey < 30000
    """,
    """
    SELECT count(DISTINCT o_orderkey) AS "uniqExact(o_orderkey)",
           count(DISTINCT o_custkey) AS "uniqExact(o_custkey)",
           count(DISTINCT o_orderstatus) AS "uniqExact(o_orderstatus)",
           count(DISTINCT lower(o_orderpriority))
             AS "uniqExact(o_orderpriority)"
    FROM orders
    WHERE o_orderkey < 30000
    """,
    ("orders",),
)

# chsql_columns_regex (round 13): COLUMNS('re') base matcher with an APPLY
# chain — regex-selected columns (RE2/Python search semantics) in table
# order.
_ch(
    "chsql_columns_regex",
    """
    SELECT COLUMNS('key$') APPLY(max) FROM orders WHERE o_orderkey < 30000
    """,
    """
    SELECT max(o_orderkey) AS "max(o_orderkey)",
           max(o_custkey) AS "max(o_custkey)"
    FROM orders
    WHERE o_orderkey < 30000
    """,
    ("orders",),
)

# chsql_untuple_agg (round 13): untuple() widening a tuple of aggregates
# into columns — expanded against the probed struct schema; Spark field
# names (_1, _2) become the output names (documented divergence from
# ClickHouse's `alias.N` header, docs/CHSQL.md).
_ch(
    "chsql_untuple_agg",
    """
    SELECT o_orderstatus AS st,
           untuple(tuple(count(), uniqExact(o_custkey)))
    FROM orders
    WHERE o_orderkey < 30000
    GROUP BY st
    ORDER BY st
    """,
    """
    SELECT o_orderstatus AS st,
           count(*) AS "_1",
           count(DISTINCT o_custkey) AS "_2"
    FROM orders
    WHERE o_orderkey < 30000
    GROUP BY st
    ORDER BY st
    """,
    ("orders",),
)

# chsql_any_right_join_first_order (round 13, verdict r12 #4): ANY RIGHT
# JOIN — the left-side-dedup mirror. Every customer row survives (right
# side); each is matched to its single EARLIEST order (date ASC, orderkey
# tiebreak) via the pinned LEFT subquery. Plan: row_number window over the
# left side (map-side WindowGroupLimit partial) feeding a RIGHT join.
_ch(
    "chsql_any_right_join_first_order",
    """
    SELECT c.c_custkey AS ck, c.c_name AS name,
           o.o_orderdate AS first_order_date,
           o.o_totalprice AS first_price
    FROM (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
          FROM orders
          ORDER BY o_orderdate, o_orderkey) AS o
    ANY RIGHT JOIN customer AS c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey < 400
    ORDER BY ck
    """,
    """
    WITH l AS (
      SELECT o_custkey, o_orderdate, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders)
    SELECT c_custkey AS ck, c_name AS name,
           l.o_orderdate AS first_order_date,
           l.o_totalprice AS first_price
    FROM l RIGHT JOIN customer ON l.o_custkey = c_custkey AND l.rn = 1
    WHERE c_custkey < 400
    ORDER BY ck
    """,
    ("customer", "orders"),
)

# chsql_first_significant_subdomain (round 13, verdict r12 #7): URLs
# synthesized from fixture columns with a mix of plain TLDs and the
# com/net/org/co second-level suffixes; the oracle CONSTRUCTS the expected
# significant label directly from the same modulus, so the rule (not
# another parser) is what's checked.
_ch(
    "chsql_first_significant_subdomain",
    """
    SELECT doc_id,
           firstSignificantSubdomain(u) AS fss,
           cutToFirstSignificantSubdomain(u) AS cfss
    FROM (SELECT doc_id,
                 concat('https://news.site', toString(doc_id % 5),
                        CASE WHEN doc_id % 2 = 0 THEN '.com.tr'
                             ELSE '.org' END,
                        '/p/', lang) AS u
          FROM documents WHERE doc_id < 60)
    ORDER BY doc_id
    """,
    """
    SELECT doc_id,
           'site' || CAST(doc_id % 5 AS VARCHAR) AS fss,
           'site' || CAST(doc_id % 5 AS VARCHAR) ||
             CASE WHEN doc_id % 2 = 0 THEN '.com.tr' ELSE '.org' END AS cfss
    FROM documents WHERE doc_id < 60
    ORDER BY doc_id
    """,
    ("documents",),
)

# chsql_multi_array_fold (round 13, verdict r12 #5): multi-array arrayFold
# over constructed equal-size arrays — zip_with structs + one (acc, struct)
# aggregate; the oracle computes the same fold arithmetically.
_ch(
    "chsql_multi_array_fold",
    """
    SELECT o_orderkey AS k,
           arrayFold((acc, x, y) -> acc + x * y,
                     array(toInt64(1), toInt64(2), toInt64(3)),
                     array(toInt64(o_orderkey % 7),
                           toInt64(o_orderkey % 5),
                           toInt64(o_orderkey % 3)),
                     toInt64(0)) AS dotp
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY k
    """,
    """
    SELECT o_orderkey AS k,
           CAST(1 * (o_orderkey % 7) + 2 * (o_orderkey % 5)
                + 3 * (o_orderkey % 3) AS BIGINT) AS dotp
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY k
    """,
    ("orders",),
)

# chsql_two_week_buckets (round 13): multi-week toStartOfInterval —
# ClickHouse aligns week intervals to 1970-01-05 (the first Monday after
# the Thursday epoch); the oracle spells the same day arithmetic, so the
# anchor (not just the 14-day modulus) is what's checked.
_ch(
    "chsql_two_week_buckets",
    """
    SELECT toStartOfInterval(o_orderdate, INTERVAL 2 WEEK) AS w2,
           count() AS c,
           uniqExact(o_custkey) AS u
    FROM orders
    GROUP BY w2
    ORDER BY w2
    """,
    """
    SELECT DATE '1970-01-05' + CAST(floor(
             datediff('day', DATE '1970-01-05', CAST(o_orderdate AS DATE))
             / 14) * 14 AS INT) AS w2,
           count(*) AS c,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS u
    FROM orders
    GROUP BY w2
    ORDER BY w2
    """,
    ("orders",),
)

# chsql_sys_columns (round 13): system.columns emulation — one row per
# column with its ClickHouse type name, derived from the parquet footer
# (catalog.register_system_views). Static oracle, same discipline as
# chsql_sys_partition_key: the fixture schema is a known constant.
_ch(
    "chsql_sys_columns",
    """
    SELECT name, type, position
    FROM system.columns
    WHERE database = 'default' AND table = 'orders'
    ORDER BY position
    """,
    """
    SELECT * FROM (VALUES
      ('o_orderkey', 'Int64', 1),
      ('o_custkey', 'Int64', 2),
      ('o_orderstatus', 'String', 3),
      ('o_totalprice', 'Float64', 4),
      ('o_orderdate', 'DateTime', 5),
      ('o_orderpriority', 'String', 6)
    ) AS t(name, type, position)
    ORDER BY position
    """,
    (),
)

# chsql_keyed_array_sort (round 13): arraySort(x -> key, arr) — the stable
# struct-sort rewrite — over constructed per-row arrays, scalarized via
# arrayStringConcat. Sorting by -v is a descending value sort, so the
# oracle reconstructs the order arithmetically (greatest / middle /
# least), independent of any list-sort machinery.
_ch(
    "chsql_keyed_array_sort",
    """
    SELECT o_orderkey AS k,
           arrayStringConcat(
             arrayMap(x -> toString(x),
                      arraySort(v -> -v,
                                array(toInt64(o_orderkey % 7),
                                      toInt64(o_orderkey % 5),
                                      toInt64(o_orderkey % 3)))), ',') AS s
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY k
    """,
    """
    SELECT o_orderkey AS k,
           CAST(greatest(a, b, c) AS VARCHAR) || ',' ||
           CAST(a + b + c - greatest(a, b, c) - least(a, b, c)
                AS VARCHAR) || ',' ||
           CAST(least(a, b, c) AS VARCHAR) AS s
    FROM (SELECT o_orderkey,
                 o_orderkey % 7 AS a, o_orderkey % 5 AS b,
                 o_orderkey % 3 AS c
          FROM orders)
    WHERE o_orderkey < 2000
    ORDER BY k
    """,
    ("orders",),
)

# chsql_grouping_sets_totals (round 13): GROUPING SETS … WITH TOTALS —
# the totals row joins the union as the () grand-total set (deduped when
# already listed), with grouping()-guarded typed key defaults. The oracle
# spells the unioned sets explicitly.
_ch(
    "chsql_grouping_sets_totals",
    """
    SELECT o_orderstatus AS st, o_orderpriority AS pri,
           count() AS c,
           sum(toInt64(round(o_totalprice))) AS tp
    FROM orders
    WHERE o_orderkey < 30000
    GROUP BY GROUPING SETS ((st, pri), (st)) WITH TOTALS
    ORDER BY st, pri, c
    """,
    """
    SELECT CASE WHEN grouping(o_orderstatus) = 1 THEN ''
                ELSE o_orderstatus END AS st,
           CASE WHEN grouping(o_orderpriority) = 1 THEN ''
                ELSE o_orderpriority END AS pri,
           count(*) AS c,
           sum(CAST(round(o_totalprice, 0) AS BIGINT)) AS tp
    FROM orders
    WHERE o_orderkey < 30000
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    ORDER BY st, pri, c
    """,
    ("orders",),
)

# chsql_tz_date_functions (round 14, verdict r13 #3): literal timezone
# arguments on the date functions translate via the from_utc_timestamp
# wrap (the rewrite the r13 refusal hints prescribed, now automated).
# Asia/Tokyo is deliberately a FIXED-offset zone (UTC+9, never DST), so
# the oracle constructs the expected wall clock with plain +9h interval
# arithmetic — the translation, not DuckDB's tz machinery, is under test.
_ch(
    "chsql_tz_date_functions",
    """
    SELECT toDate(ts, 'Asia/Tokyo') AS tokyo_date,
           toStartOfInterval(ts, INTERVAL 6 HOUR, 'Asia/Tokyo') AS h6,
           count() AS c,
           uniqExact(user_id) AS u
    FROM events
    GROUP BY tokyo_date, h6
    ORDER BY h6
    """,
    """
    WITH s AS (SELECT ts + INTERVAL 9 HOUR AS tsh, user_id FROM events)
    SELECT CAST(tsh AS DATE) AS tokyo_date,
           date_trunc('day', tsh)
             + (CAST(hour(tsh) AS INT) // 6) * 6 * INTERVAL 1 HOUR AS h6,
           count(*) AS c,
           CAST(count(DISTINCT user_id) AS BIGINT) AS u
    FROM s GROUP BY 1, 2 ORDER BY h6
    """,
    ("events",),
)

# chsql_final_replacing (round 14, verdict r13 #1): `FROM events FINAL` at
# SQL level — expanded in run_ch_sql against catalog.MERGETREE_ENGINES
# (events is registered ReplacingMergeTree, key (user_id, event_type),
# version (ts, event_id) — the deterministic tie-break). Plan: row_number
# window with a map-side WindowGroupLimit partial BEFORE the shuffle; a
# WHERE on the key pushes into the parquet scan below the window.
_ch(
    "chsql_final_replacing",
    """
    SELECT user_id, event_type, value AS final_value, ts AS final_ts
    FROM events FINAL
    WHERE user_id < 400
    ORDER BY user_id, event_type
    """,
    """
    WITH v AS (
      SELECT user_id, event_type, value, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE user_id < 400)
    SELECT user_id, event_type, value AS final_value, ts AS final_ts
    FROM v WHERE rn = 1
    ORDER BY user_id, event_type
    """,
    ("events",),
)


# chsql_final_versioned_collapsing (round 14): VersionedCollapsingMergeTree
# FINAL — per-(key, version) sign cancellation; survivors are the
# |n(+1) − n(−1)| rows of the majority sign. The engines= override stands
# in for reading the table's DDL (sign derived from event_id parity, the
# ch_versioned_collapsing_final fixture convention); the oracle computes
# the surviving multiset arithmetically.
_FINAL_VC_SQL = """
    SELECT user_id, event_type,
           count() AS n_surviving,
           sum(toInt64(event_id % 2 = 0 ? 1 : -1)) AS net_total
    FROM events FINAL
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
"""

_FINAL_VC_ORACLE = """
    WITH s AS (
      SELECT user_id, event_type,
             CAST(date_trunc('day', ts) AS DATE) AS d,
             SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END) AS net
      FROM events GROUP BY 1, 2, 3)
    SELECT user_id, event_type,
           CAST(SUM(abs(net)) AS BIGINT) AS n_surviving,
           CAST(SUM(net) AS BIGINT) AS net_total
    FROM s WHERE net <> 0
    GROUP BY 1, 2
    ORDER BY user_id, event_type
"""


@register("chsql_final_versioned_collapsing", _FINAL_VC_ORACLE)
def chsql_final_versioned_collapsing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ClickHouse SQL via run_ch_sql with a per-call engine declaration —
    the DDL-reading path a migrating user takes for tables the default
    registry doesn't describe."""
    return run_ch_sql(
        spark,
        _FINAL_VC_SQL,
        sf_dir,
        tables=("events",),
        engines={
            "events": {
                "engine": "VersionedCollapsingMergeTree",
                "key": ("user_id", "event_type"),
                "version": ("toDate(ts)",),
                "sign": "if(event_id % 2 = 0, 1, -1)",
            }
        },
    )


# chsql_sample (round 14, verdict r13 #2): `SAMPLE k OFFSET m` → the
# deterministic hash-range subquery over the registered SAMPLE BY key
# (orders: o_orderkey). Both sides compute the IDENTICAL md5-based 32-bit
# hash (functions/hashing.py stable_hash32 / oracle_hash_sql), so the
# oracle checks the exact row multiset, not just approximate counts.
_SAMPLE_LO = int((2 / 10) * 4294967296)
_SAMPLE_HI = int((2 / 10 + 1 / 10) * 4294967296)

_ch(
    "chsql_sample",
    """
    SELECT count() AS c,
           uniqExact(o_custkey) AS u,
           sum(toInt64(o_orderkey)) AS sk
    FROM orders SAMPLE 1/10 OFFSET 2/10
    """,
    f"""
    SELECT count(*) AS c,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS u,
           CAST(sum(o_orderkey) AS BIGINT) AS sk
    FROM orders
    WHERE (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT)
            >= {_SAMPLE_LO}
      AND (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT)
            < {_SAMPLE_HI}
    """,
    ("orders",),
)

# chsql_window_funnel (round 14, verdict r13 #4): the flagship ClickHouse
# event-analytics aggregate in VERBATIM SQL — windowFunnel(window)(ts,
# cond…) emits a pure aggregate expression (sorted condition-tagged
# entries folded with JVM HOFs; one shuffle on the GROUP BY key, zero
# Python). The oracle is the cascaded-running-max formulation proven
# equivalent to ClickHouse's chain algorithm (the ev_window_funnel_sliding
# shape: choosing the LATEST qualifying anchor maximizes slack for every
# inner condition, and the within-window check on intermediate steps is
# subsumed by the final step's check).
_ch(
    "chsql_window_funnel",
    """
    WITH lv AS (
      SELECT user_id,
             windowFunnel(14400)(ts, event_type = 'view',
                                 event_type = 'click',
                                 event_type = 'purchase') AS level
      FROM events GROUP BY user_id)
    SELECT level, count() AS n_users FROM lv GROUP BY level ORDER BY level
    """,
    """
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             MAX(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS lv
      FROM events),
    seq2 AS (
      SELECT user_id, ts, event_type, lv,
             MAX(CASE WHEN event_type = 'click' THEN lv END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS bc
      FROM seq),
    per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
             MAX(CASE WHEN event_type = 'click' AND lv IS NOT NULL
                      AND ts <= lv + INTERVAL 4 HOUR THEN 1 ELSE 0 END)
               AS s2,
             MAX(CASE WHEN event_type = 'purchase' AND bc IS NOT NULL
                      AND ts <= bc + INTERVAL 4 HOUR THEN 1 ELSE 0 END)
               AS s3
      FROM seq2 GROUP BY user_id)
    SELECT CASE WHEN s3 = 1 THEN 3 WHEN s2 = 1 THEN 2
                WHEN s1 = 1 THEN 1 ELSE 0 END AS level,
           count(*) AS n_users
    FROM per_user GROUP BY 1 ORDER BY 1
    """,
    ("events",),
)

# chsql_retention (round 14): retention(c1, …) — r[0] = c1 matched,
# r[i] = c1 AND c(i+1) matched — scalarized via 1-based arrayElement.
_ch(
    "chsql_retention",
    """
    WITH r AS (
      SELECT user_id,
             retention(event_type = 'view', event_type = 'click',
                       event_type = 'purchase') AS r
      FROM events GROUP BY user_id)
    SELECT sum(arrayElement(r, 1)) AS n_viewed,
           sum(arrayElement(r, 2)) AS n_viewed_clicked,
           sum(arrayElement(r, 3)) AS n_viewed_purchased,
           count() AS n_users
    FROM r
    """,
    """
    WITH m AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c1,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c2,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c3
      FROM events GROUP BY user_id)
    SELECT CAST(sum(c1) AS BIGINT) AS n_viewed,
           CAST(sum(c1 * c2) AS BIGINT) AS n_viewed_clicked,
           CAST(sum(c1 * c3) AS BIGINT) AS n_viewed_purchased,
           count(*) AS n_users
    FROM m
    """,
    ("events",),
)

# chsql_sequence_match (round 14): subsequence patterns ('(?a).*(?b)') via
# a greedy fold over the sorted condition-bitmask entries — greedy
# earliest-match is exact for subsequence existence. The oracle derives
# the same fact from min/max timestamps per condition (valid because the
# fixture has no same-user timestamp ties, asserted in TESTDATA checks).
_ch(
    "chsql_sequence_match",
    """
    WITH m AS (
      SELECT user_id,
             sequenceMatch('(?1).*(?2)')(ts, event_type = 'view',
                                         event_type = 'purchase') AS vp,
             sequenceMatch('(?2).*(?1)')(ts, event_type = 'view',
                                         event_type = 'purchase') AS pv
      FROM events GROUP BY user_id)
    SELECT sum(vp) AS n_view_then_purchase,
           sum(pv) AS n_purchase_then_view,
           count() AS n_users
    FROM m
    """,
    """
    WITH m AS (
      SELECT user_id,
             CASE WHEN min(CASE WHEN event_type = 'view' THEN ts END)
                       < max(CASE WHEN event_type = 'purchase' THEN ts END)
                  THEN 1 ELSE 0 END AS vp,
             CASE WHEN min(CASE WHEN event_type = 'purchase' THEN ts END)
                       < max(CASE WHEN event_type = 'view' THEN ts END)
                  THEN 1 ELSE 0 END AS pv
      FROM events GROUP BY user_id)
    SELECT CAST(sum(vp) AS BIGINT) AS n_view_then_purchase,
           CAST(sum(pv) AS BIGINT) AS n_purchase_then_view,
           count(*) AS n_users
    FROM m
    """,
    ("events",),
)

# chsql_bare_array_join (round 14, verdict r13 #5): alias-less ARRAY JOIN
# — ClickHouse makes the array NAME refer to the elements in scope; the
# translator aliases the element and renames in-scope references, keeping
# ClickHouse's result header (the bare select item aliases back). One
# generator, no shuffle beyond the ORDER BY.
_ch(
    "chsql_bare_array_join",
    """
    WITH w AS (SELECT doc_id, array(lang, source) AS tags
               FROM documents WHERE doc_id < 300)
    SELECT doc_id, tags, upper(tags) AS u
    FROM w ARRAY JOIN tags
    ORDER BY doc_id, tags
    """,
    """
    SELECT doc_id, t.tags AS tags, upper(t.tags) AS u
    FROM (SELECT doc_id, unnest([lang, source]) AS tags
          FROM documents WHERE doc_id < 300) t
    ORDER BY doc_id, tags
    """,
    ("documents",),
)

# chsql_neighbor_type_default (round 14, verdict r13 #7): the 2-arg
# neighbor — ClickHouse fills the COLUMN TYPE's default out of range;
# run_ch_sql probes value's type (Float64 → 0) from the FROM schema and
# splices the literal, then the usual pin rewrite applies.
_ch(
    "chsql_neighbor_type_default",
    """
    SELECT event_id,
           neighbor(value, 1) AS next_v,
           neighbor(event_type, -1) AS prev_type
    FROM events
    WHERE user_id < 20
    ORDER BY ts, event_id
    """,
    """
    SELECT event_id,
           lead(value, 1, 0.0) OVER (ORDER BY ts, event_id) AS next_v,
           lag(event_type, 1, '') OVER (ORDER BY ts, event_id) AS prev_type
    FROM events
    WHERE user_id < 20
    ORDER BY ts, event_id
    """,
    ("events",),
)

# chsql_sequence_count (round 14): non-overlapping chain counting — the
# fold is ClickHouse's sequential state machine (restart AFTER each
# completed chain). The oracle uses the closed form for the 2-step
# pattern: in the view/purchase subsequence, a chain completes exactly at
# each view-run → purchase-run boundary (the first purchase after a
# pending view), so the count is the number of (prev='view',
# cur='purchase') adjacencies. NOTE this is NOT max disjoint-pair
# matching — 'v v p p' counts 1 (the scan consumes both views before the
# first purchase), which the first draft of this oracle got wrong.
_ch(
    "chsql_sequence_count",
    """
    WITH m AS (
      SELECT user_id,
             sequenceCount('(?1).*(?2)')(ts, event_type = 'view',
                                         event_type = 'purchase') AS c
      FROM events GROUP BY user_id)
    SELECT sum(c) AS total_chains, max(c) AS max_chains,
           count() AS n_users
    FROM m
    """,
    """
    WITH f AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events WHERE event_type IN ('view', 'purchase')),
    m AS (
      SELECT u.user_id,
             coalesce(sum(CASE WHEN f.event_type = 'purchase'
                                AND f.prev = 'view' THEN 1 END), 0) AS c
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN f ON f.user_id = u.user_id
      GROUP BY u.user_id)
    SELECT CAST(sum(c) AS BIGINT) AS total_chains,
           CAST(max(c) AS BIGINT) AS max_chains,
           count(*) AS n_users
    FROM m
    """,
    ("events",),
)


# Round 14b: greatCircleDistance translates inline (lon-first argument
# order) as the exact haversine on the 6371 km sphere — the identical
# formula text evaluates on both engines (operators/geo.py discipline).
# Coordinates are derived deterministically from c_custkey because the
# fixtures carry none.
_ch(
    "chsql_great_circle",
    """
    SELECT c_custkey,
           round(greatCircleDistance(
               toFloat64(c_custkey * 73 % 3600) / 10.0 - 180.0,
               toFloat64(c_custkey * 37 % 1800) / 10.0 - 90.0,
               -122.4194, 37.7749) / 1000.0, 3) AS dist_sf_km,
           round(greatCircleDistance(
               toFloat64(c_custkey * 73 % 3600) / 10.0 - 180.0,
               toFloat64(c_custkey * 37 % 1800) / 10.0 - 90.0,
               103.8198, 1.3521) / 1000.0, 3) AS dist_sg_km
    FROM customer
    WHERE c_custkey <= 500
    ORDER BY c_custkey
    """,
    """
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey * 37 % 1800 AS DOUBLE) / 10.0 - 90.0 AS lat,
             CAST(c_custkey * 73 % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon
      FROM customer WHERE c_custkey <= 500)
    SELECT c_custkey,
           ROUND(2.0 * 6371000.0 * asin(sqrt(
               pow(sin(radians(37.7749 - lat) / 2), 2) +
               cos(radians(lat)) * cos(radians(37.7749)) *
               pow(sin(radians(-122.4194 - lon) / 2), 2))) / 1000.0, 3)
             AS dist_sf_km,
           ROUND(2.0 * 6371000.0 * asin(sqrt(
               pow(sin(radians(1.3521 - lat) / 2), 2) +
               cos(radians(lat)) * cos(radians(1.3521)) *
               pow(sin(radians(103.8198 - lon) / 2), 2))) / 1000.0, 3)
             AS dist_sg_km
    FROM pts
    ORDER BY c_custkey
    """,
    ("customer",),
)

# Round 14b: arrayAUC as a per-group ranking quality score — the Spark side
# folds the pairwise tie-corrected definition row-locally (JVM HOFs, no
# Python); the DuckDB oracle derives the SAME quantity through the
# INDEPENDENT Mann-Whitney rank-statistic form (average ranks over ties),
# so a defect in either derivation cannot hide. Groups with a single
# class are excluded on both sides (CH would return NaN there).
_ch(
    "chsql_array_auc",
    """
    SELECT user_id,
           round(arrayAUC(groupArray(score), groupArray(label)), 6) AS auc
    FROM (SELECT user_id, ts, event_id, value AS score,
                 if(event_type IN ('click', 'purchase'), 1, 0) AS label
          FROM events WHERE user_id < 40 ORDER BY ts, event_id)
    GROUP BY user_id
    HAVING min(label) = 0 AND max(label) = 1
    ORDER BY user_id
    """,
    """
    WITH src AS (
      SELECT user_id, value AS score,
             CASE WHEN event_type IN ('click', 'purchase')
                  THEN 1 ELSE 0 END AS label
      FROM events WHERE user_id < 40),
    ranked AS (
      SELECT user_id, label,
             CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY score
                  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE)
             - (CAST(COUNT(*) OVER (PARTITION BY user_id, score)
                     AS DOUBLE) - 1) / 2.0 AS avg_rank
      FROM src),
    agg AS (
      SELECT user_id,
             SUM(CASE WHEN label = 1 THEN avg_rank ELSE 0 END)
               AS pos_rank_sum,
             SUM(label) AS p, SUM(1 - label) AS n
      FROM ranked GROUP BY user_id)
    SELECT user_id,
           ROUND((pos_rank_sum - p * (p + 1) / 2.0) / (p * n), 6) AS auc
    FROM agg
    WHERE p > 0 AND n > 0
    ORDER BY user_id
    """,
    ("events",),
)


# Round 14b: the full MySQL week-mode family. The Spark side translates
# toWeek/toYearWeek modes through the anchored-week formula (ch_sql.py
# _WEEK_MODES); the oracle RE-DERIVES the same numbering in DuckDB from
# its OWN primitives (dayofweek with Sunday=0, date-integer arithmetic),
# so the two engines share no formula text; mode 3 additionally rides
# DuckDB's native ISO weekofyear/isoyear. Row-local projections — no
# shuffle at any scale.
_ch(
    "chsql_week_modes",
    """
    SELECT o_orderkey,
           toWeek(o_orderdate, 0) AS w0,
           toWeek(o_orderdate, 3) AS w3,
           toWeek(o_orderdate, 8) AS w8,
           toYearWeek(o_orderdate, 0) AS yw0,
           toYearWeek(o_orderdate, 3) AS yw3
    FROM orders
    WHERE o_orderkey <= 2000
    ORDER BY o_orderkey
    """,
    """
    WITH base AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
             CAST(year(o_orderdate) AS INTEGER) AS y
      FROM orders WHERE o_orderkey <= 2000),
    ws AS (
      SELECT o_orderkey, d, y,
             make_date(y, 1, 7) - CAST(dayofweek(make_date(y, 1, 7)) AS INTEGER) AS s0c,
             make_date(y+1, 1, 7)
               - CAST(dayofweek(make_date(y+1, 1, 7)) AS INTEGER) AS s0n,
             make_date(y-1, 1, 7)
               - CAST(dayofweek(make_date(y-1, 1, 7)) AS INTEGER) AS s0p,
             make_date(y, 1, 1) - CAST(dayofweek(make_date(y, 1, 1)) AS INTEGER) AS s8c,
             make_date(y+1, 1, 1)
               - CAST(dayofweek(make_date(y+1, 1, 1)) AS INTEGER) AS s8n
      FROM base)
    SELECT o_orderkey,
           CASE WHEN date_diff('day', s0c, d) < 0 THEN 0
                ELSE date_diff('day', s0c, d) // 7 + 1 END AS w0,
           weekofyear(d) AS w3,
           CASE WHEN date_diff('day', s8n, d) >= 0 THEN 1
                ELSE date_diff('day', s8c, d) // 7 + 1 END AS w8,
           CASE WHEN date_diff('day', s0n, d) >= 0 THEN (y+1) * 100 + 1
                WHEN date_diff('day', s0c, d) < 0
                  THEN (y-1) * 100 + date_diff('day', s0p, d) // 7 + 1
                ELSE y * 100 + date_diff('day', s0c, d) // 7 + 1
           END AS yw0,
           isoyear(d) * 100 + weekofyear(d) AS yw3
    FROM ws
    ORDER BY o_orderkey
    """,
    ("orders",),
)


# Round 14b: quantileExactWeighted as a grouped aggregate. The Spark side
# folds the sorted (value, weight) list against the level*total threshold
# (the rule weighted_median_price_per_flag pins); the DuckDB oracle
# derives the same values RELATIONALLY — a cumulative-weight window over
# value order and a MIN-over-threshold pick — so the two paths share no
# mechanism. Weights are integers, so every double sum is exact and the
# >= boundary cannot drift between engines. The bounded WHERE keeps the
# per-group collected state test-sized; corpus-scale weighted quantiles
# belong to the windowed relational form.
_ch(
    "chsql_quantile_weighted",
    """
    SELECT l_returnflag AS flag,
           quantileExactWeighted(0.25)(l_extendedprice, l_quantity) AS q25,
           quantileExactWeighted(l_extendedprice, l_quantity) AS q50,
           quantileExactWeighted(0.9)(l_extendedprice, l_quantity) AS q90
    FROM lineitem
    WHERE l_orderkey < 30000
    GROUP BY l_returnflag
    ORDER BY flag
    """,
    """
    WITH cum AS (
      SELECT l_returnflag AS flag,
             CAST(l_extendedprice AS DOUBLE) AS v,
             SUM(CAST(l_quantity AS DOUBLE)) OVER (
               PARTITION BY l_returnflag ORDER BY l_extendedprice
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(CAST(l_quantity AS DOUBLE)) OVER (
               PARTITION BY l_returnflag) AS tw
      FROM lineitem WHERE l_orderkey < 30000)
    SELECT flag,
           MIN(CASE WHEN cw >= 0.25 * tw THEN v END) AS q25,
           MIN(CASE WHEN cw >= 0.5 * tw THEN v END) AS q50,
           MIN(CASE WHEN cw >= 0.9 * tw THEN v END) AS q90
    FROM cum
    GROUP BY flag
    ORDER BY flag
    """,
    ("lineitem",),
)


# Round 14b: the absolute-rows SAMPLE form. The Spark side resolves
# `SAMPLE 1500` through a translate-time count(*) probe into a LITERAL
# hash threshold (ClickHouse does the same against its approximate table
# statistics); the oracle recomputes floor(least(1.0, n/total) * 2^32)
# from ITS OWN count — identical IEEE arithmetic, so the two thresholds
# and therefore the exact sampled row multisets agree at every SF.
_ch(
    "chsql_sample_rows",
    """
    SELECT count() AS c,
           uniqExact(o_custkey) AS u,
           sum(toInt64(o_orderkey)) AS sk
    FROM orders SAMPLE 1500
    """,
    """
    SELECT count(*) AS c,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS u,
           CAST(sum(o_orderkey) AS BIGINT) AS sk
    FROM orders
    WHERE (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT)
          < FLOOR(LEAST(1.0, 1500.0 /
                  (SELECT CAST(count(*) AS DOUBLE) FROM orders))
                  * 4294967296.0)
    """,
    ("orders",),
)
