"""Property-based tests (hypothesis) for the pure-Python engine pieces."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from clickhousemigrators3_spark.report import exit_code, summarize
from clickhousemigrators3_spark.resume import remaining, serialize_partition


@given(
    st.lists(st.text(max_size=8), max_size=30, unique=True),
    st.lists(st.text(max_size=8), max_size=30),
)
def test_remaining_is_order_preserving_set_difference(all_parts, done):
    out = remaining(all_parts, done)
    assert out == [p for p in all_parts if p not in set(done)]
    # idempotent: removing done twice changes nothing
    assert remaining(out, done) == out


@given(
    st.lists(
        st.tuples(
            st.one_of(st.integers(), st.text(max_size=5), st.none()),
            st.one_of(st.integers(), st.text(max_size=5)),
        ),
        max_size=10,
    )
)
def test_serialize_partition_deterministic(values):
    for v in values:
        assert serialize_partition(v) == serialize_partition(tuple(v))


@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "status": st.sampled_from(["completed", "failed", "skipped", "locked"]),
                "migrated_rows": st.integers(min_value=0, max_value=10**9),
                "completed_partitions": st.integers(min_value=0, max_value=1000),
            }
        ),
        max_size=20,
    )
)
@settings(max_examples=50)
def test_summary_tallies_consistent(results):
    s = summarize(results)
    assert s["total_tables"] == len(results)
    assert (
        s["completed"] + s["failed"] + s["skipped"] + s["locked"] == len(results)
    )
    assert s["migrated_rows"] == sum(r["migrated_rows"] for r in results)
    assert (exit_code(results) == 1) == any(r["status"] == "failed" for r in results)


@given(st.text(max_size=40))
@settings(max_examples=30)
def test_config_coercion_bools(s):
    from clickhousemigrators3_spark.config import _coerce

    out = _coerce("resume", s)
    assert isinstance(out, bool)
    assert out == (s.strip().lower() in ("1", "true", "yes", "on"))


@given(
    st.integers(min_value=1, max_value=300),
    st.integers(min_value=1, max_value=300),
    st.integers(min_value=0, max_value=255),
)
@settings(max_examples=40)
def test_codec_png_roundtrip(w, h, gray):
    from clickhousemigrators3_spark.functions.codecs import make_png, parse_header

    hdr = parse_header(make_png(w, h, gray=gray))
    assert (hdr["fmt"], hdr["width"], hdr["height"]) == ("png", w, h)
    assert (hdr["bit_depth"], hdr["channels"]) == (8, 1)


@given(
    st.integers(min_value=0, max_value=50_000),
    st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    st.integers(min_value=1, max_value=8),
    st.sampled_from([8, 16, 24, 32]),
)
@settings(max_examples=40)
def test_codec_wav_roundtrip(n_samples, rate, channels, bits):
    from clickhousemigrators3_spark.functions.codecs import make_wav, parse_header

    hdr = parse_header(make_wav(n_samples, rate, channels, bits))
    assert (hdr["fmt"], hdr["channels"], hdr["sample_rate"]) == ("wav", channels, rate)
    assert hdr["bit_depth"] == bits
    assert hdr["n_samples"] == n_samples
    assert hdr["duration_ms"] == n_samples * 1000 // rate


@given(st.binary(max_size=64))
@settings(max_examples=60)
def test_codec_parse_never_raises(payload):
    """Arbitrary (possibly truncated/garbage) payloads must parse to SOME
    metadata row, never raise — the property the mapInPandas stage relies on
    for corrupt inputs at 100 TB."""
    from clickhousemigrators3_spark.functions.codecs import parse_header

    out = parse_header(payload)
    assert out["n_bytes"] == len(payload)
    assert isinstance(out["fmt"], str)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3 * 3600),  # start offset s
            st.integers(min_value=0, max_value=2 * 3600),  # duration s
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=15, deadline=None)
def test_peak_concurrency_property(spark, intervals):
    """The carry-in + per-hour-prefix decomposition must equal the literal
    definition for ARBITRARY closed intervals (crossing hour boundaries,
    nested, duplicated, zero-length) — the failure modes fixture data
    can't be relied on to contain."""
    import datetime

    from clickhousemigrators3_spark.operators.events import (
        peak_concurrency_hourly,
    )

    base = datetime.datetime(2024, 1, 1)
    iv = [
        (
            base + datetime.timedelta(seconds=s0),
            base + datetime.timedelta(seconds=s0 + dur),
        )
        for s0, dur in intervals
    ]
    df = spark.createDataFrame(iv, "s timestamp_ntz, e timestamp_ntz")
    got = {
        r["hour"]: r["peak_concurrency"]
        for r in peak_concurrency_hourly(df).collect()
    }

    def floor_hour(t):
        return t.replace(minute=0, second=0, microsecond=0)

    expected = {}
    for t in [s for s, _ in iv] + [e for _, e in iv]:
        c = sum(1 for s, e in iv if s <= t <= e)
        h = floor_hour(t)
        expected[h] = max(expected.get(h, 0), c)
    lo = floor_hour(min(s for s, _ in iv))
    hi = floor_hour(max(e for _, e in iv))
    h = lo
    while h <= hi:
        if h not in expected:
            expected[h] = sum(1 for s, e in iv if s < h <= e)
        h += datetime.timedelta(hours=1)

    assert got == expected, (iv, got, expected)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),           # user
            st.integers(min_value=0, max_value=30) | st.integers(min_value=0, max_value=60 * 3600),  # ts offset s (tie-heavy | wide)
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=15, deadline=None)
def test_sliding_funnel_property(spark, events):
    """The cascaded running-max funnel reduction must equal the literal
    exists-any-chain triple scan for ARBITRARY event sequences — including
    same-instant events and orderings the fixtures never produce."""
    import datetime

    from clickhousemigrators3_spark.operators.event_analytics import (
        window_funnel_sliding,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, base + datetime.timedelta(seconds=off), i, typ)
        for i, (u, off, typ) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, event_type string"
    )
    got = {r["step"]: r["n_users"] for r in window_funnel_sliding(df).collect()}

    # "before" = earlier in (ts, event_id) row order — the query's
    # documented deterministic tie semantics (ClickHouse leaves equal
    # timestamps undefined); the window bound itself compares times only
    w = datetime.timedelta(hours=24)
    expected_counts = {}
    users = {u for u, _, _ in events}
    for u in users:
        evs = [(t, i, typ) for uu, t, i, typ in rows if uu == u]
        vs = [(t, i) for t, i, typ in evs if typ == "view"]
        cs = [(t, i) for t, i, typ in evs if typ == "click"]
        ps = [(t, i) for t, i, typ in evs if typ == "purchase"]
        step = 0
        if vs:
            step = 1
        if any(v < c and c[0] <= v[0] + w for v in vs for c in cs):
            step = 2
        if any(
            v < c < p and p[0] <= v[0] + w
            for v in vs
            for c in cs
            for p in ps
        ):
            step = 3
        expected_counts[step] = expected_counts.get(step, 0) + 1
    assert got == expected_counts, (rows, got, expected_counts)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),           # user
            st.integers(min_value=0, max_value=30) | st.integers(min_value=0, max_value=4 * 3600),  # ts offset s (tie-heavy | wide)
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=18,
    )
)
@settings(max_examples=12, deadline=None)
def test_sql_window_funnel_matches_clickhouse_algorithm(spark, events):
    """Round 14: the translated windowFunnel(w)(ts, c…) aggregate must
    equal a literal Python transcription of ClickHouse's
    AggregateFunctionWindowFunnel for ARBITRARY sequences — including
    same-instant events, where CH sorts (timestamp, condition_index)
    pairs and a same-timestamp later-condition event may extend the
    chain (`<=` window comparison)."""
    import datetime

    from clickhousemigrators3_spark.functions.ch_sql import run_ch_sql

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, base + datetime.timedelta(seconds=off), typ)
        for (u, off, typ) in events
    ]
    spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string"
    ).createOrReplaceTempView("wf_prop_t")
    got = {
        r.user_id: r.lv
        for r in run_ch_sql(
            spark,
            "SELECT user_id, windowFunnel(3600)(ts, "
            "event_type = 'view', event_type = 'click', "
            "event_type = 'purchase') AS lv "
            "FROM wf_prop_t GROUP BY user_id",
        ).collect()
    }

    conds = {"view": 1, "click": 2, "purchase": 3}
    win = 3600.0
    expected = {}
    for u in {r[0] for r in rows}:
        entries = sorted(
            (t.timestamp(), conds[typ])
            for uu, t, typ in rows
            if uu == u and typ in conds
        )
        levels = [None, None, None]  # chain-start ts per level
        for t, i in entries:
            if i == 1:
                levels[0] = t
            elif levels[i - 2] is not None and t <= levels[i - 2] + win:
                levels[i - 1] = levels[i - 2]
        lv = sum(1 for x in levels if x is not None)
        expected[u] = lv
    assert got == expected, (rows, got, expected)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),           # user
            st.integers(min_value=0, max_value=20) | st.integers(min_value=0, max_value=3600),  # ts offset (tie-heavy | wide)
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=18,
    )
)
@settings(max_examples=12, deadline=None)
def test_sql_sequence_match_count_match_state_machine(spark, events):
    """Round 14: translated sequenceMatch/sequenceCount must equal the
    literal sequential state machine (CH restarts the pattern AFTER each
    completed chain — NOT max disjoint matching: 'v v p p' counts 1)."""
    import datetime

    from clickhousemigrators3_spark.functions.ch_sql import run_ch_sql

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, base + datetime.timedelta(seconds=off), typ)
        for (u, off, typ) in events
    ]
    spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string"
    ).createOrReplaceTempView("sm_prop_t")
    got = {
        r.user_id: (r.m, r.c)
        for r in run_ch_sql(
            spark,
            "SELECT user_id, "
            "sequenceMatch('(?1).*(?2).*(?3)')(ts, event_type = 'view', "
            "event_type = 'click', event_type = 'purchase') AS m, "
            "sequenceCount('(?1).*(?2)')(ts, event_type = 'view', "
            "event_type = 'click') AS c "
            "FROM sm_prop_t GROUP BY user_id",
        ).collect()
    }

    conds = {"view": 1, "click": 2, "purchase": 3}
    expected = {}
    for u in {r[0] for r in rows}:
        # sorted like the fold: (timestamp, bitmask); condition-less
        # events are skipped entirely
        evs = sorted(
            (t.timestamp(), 1 << (conds[typ] - 1))
            for uu, t, typ in rows
            if uu == u and typ in conds
        )
        pat3 = [1, 2, 4]
        p = 0
        for _, m in evs:
            if p < 3 and m & pat3[p]:
                p += 1
        match3 = 1 if p == 3 else 0
        pat2 = [1, 2]
        p = cnt = 0
        for _, m in evs:
            if p < 2 and m & pat2[p]:
                p += 1
                if p == 2:
                    cnt += 1
                    p = 0
        expected[u] = (match3, cnt)
    assert got == expected, (rows, got, expected)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # score (tie-heavy)
            st.integers(min_value=0, max_value=1),  # label
        ),
        min_size=2,
        max_size=25,
    )
)
@settings(max_examples=20, deadline=None)
def test_roc_auc_matches_pairwise_definition(spark, rows):
    """The rank-sum AUC must equal the literal pairwise probability
    P(score⁺ > score⁻) + ½P(tie) for ARBITRARY score/label data, including
    heavy ties, all-one-class groups (dropped), and n=2 edges."""
    from clickhousemigrators3_spark.operators.mleval import roc_auc_by_group

    df = spark.createDataFrame(
        [(1, float(s), y) for s, y in rows], "g int, score double, y int"
    )
    out = roc_auc_by_group(df, group="g").collect()
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    if not pos or not neg:
        assert out == []
        return
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    expected = wins / (len(pos) * len(neg))
    assert len(out) == 1
    assert abs(out[0].roc_auc - expected) < 1e-6, (rows, out[0].roc_auc, expected)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # score (tie-heavy)
            st.integers(min_value=0, max_value=1),  # label
        ),
        min_size=2,
        max_size=18,
    )
)
@settings(max_examples=15, deadline=None)
def test_sql_array_auc_matches_pairwise_definition(spark, rows):
    """Round 14b: the translated arrayAUC(scores, labels) SQL fold must
    equal the literal pairwise P(score⁺ > score⁻) + ½P(tie) for arbitrary
    tie-heavy inputs — the same definition the relational
    roc_auc_by_group is pinned to, so both AUC surfaces agree with each
    other by transitivity. Single-class inputs are NaN."""
    import math

    from clickhousemigrators3_spark.functions.ch_sql import translate_ch_sql

    scores = "array(" + ", ".join(f"{float(s)!r}" for s, _ in rows) + ")"
    labels = "array(" + ", ".join(str(y) for _, y in rows) + ")"
    got = spark.sql(
        translate_ch_sql(f"SELECT arrayAUC({scores}, {labels}) AS auc")
    ).collect()[0].auc
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    if not pos or not neg:
        assert math.isnan(got), (rows, got)
        return
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    expected = wins / (len(pos) * len(neg))
    assert abs(got - expected) < 1e-9, (rows, got, expected)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # value (tie-heavy)
            st.integers(min_value=1, max_value=5),  # weight
        ),
        min_size=1,
        max_size=15,
    ),
    st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]),
)
@settings(max_examples=15, deadline=None)
def test_sql_quantile_exact_weighted_matches_threshold_rule(
    spark, pairs, level
):
    """Round 14b: the translated quantileExactWeighted fold must equal
    the literal threshold rule — sort by value, pick the first whose
    cumulative weight reaches level * total (>=) — for arbitrary
    tie-heavy inputs, the same rule the relational
    weighted_median_price_per_flag operator is pinned to."""
    from clickhousemigrators3_spark.functions.ch_sql import translate_ch_sql

    vals = ", ".join(f"({float(v)!r}, {w})" for v, w in pairs)
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW qew_prop_t AS "
        f"SELECT * FROM VALUES {vals} AS t(v, w)"
    )
    got = spark.sql(
        translate_ch_sql(
            f"SELECT quantileExactWeighted({level!r})(v, w) AS q "
            "FROM qew_prop_t"
        )
    ).collect()[0].q
    ordered = sorted((float(v), w) for v, w in pairs)
    total = float(sum(w for _, w in pairs))
    thr = level * total
    cum = 0.0
    expected = ordered[-1][0]
    for v, w in ordered:
        cum += w
        if cum >= thr:
            expected = v
            break
    assert got == expected, (pairs, level, got, expected)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # score (tie-heavy)
            st.integers(min_value=0, max_value=1),  # label
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=20, deadline=None)
def test_avg_precision_matches_literal_definition(spark, rows):
    """Window-form AP must equal the literal Σ Precision@k / n⁺ walk over
    the same deterministic (score DESC, id ASC) ranking."""
    from clickhousemigrators3_spark.operators.mleval import (
        avg_precision_by_group,
    )

    data = [(1, i, float(s), y) for i, (s, y) in enumerate(rows)]
    df = spark.createDataFrame(data, "g int, event_id int, score double, y int")
    out = avg_precision_by_group(df, group="g").collect()
    ranked = sorted(data, key=lambda r: (-r[2], r[1]))
    n_pos = sum(y for *_, y in ranked)
    if n_pos == 0:
        assert out == []
        return
    cum = 0
    ap = 0.0
    for k, (_, _, _, y) in enumerate(ranked, start=1):
        cum += y
        if y:
            ap += cum / k
    expected = ap / n_pos
    assert len(out) == 1
    assert abs(out[0].avg_precision - expected) < 1e-6, (rows, out[0].avg_precision, expected)


@given(
    st.lists(
        st.lists(
            st.sampled_from("abcdefgh"),  # tiny vocab → collisions likely
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=12, deadline=None)
def test_substring_dedup_pairs_property(spark, docs_words):
    """dedup_substring_pairs must equal the literal definition — count of
    shared distinct SUB_K-word spans per doc pair under the df gate — for
    ARBITRARY corpora (shared spans at any offset, repeated spans inside
    one doc, docs too short to span, boilerplate shared by everyone)."""
    from collections import defaultdict

    from clickhousemigrators3_spark.operators.dedup import (
        SUB_K,
        SUB_MAX_DF,
        dedup_substring_pairs,
    )

    k = 3  # property grain: SUB_K is 12, too long for generated docs
    import clickhousemigrators3_spark.operators.dedup as dd

    texts = [(i, " ".join(w)) for i, w in enumerate(docs_words)]
    # literal definition in plain Python
    spans = defaultdict(set)  # span -> {doc}
    for i, words in enumerate(docs_words):
        for s in range(max(0, len(words) - k + 1)):
            spans[" ".join(words[s : s + k])].add(i)
    expected = defaultdict(int)
    for _span, ds in spans.items():
        if not (1 < len(ds) <= SUB_MAX_DF):
            continue
        ds = sorted(ds)
        for x in range(len(ds)):
            for y in range(x + 1, len(ds)):
                expected[(ds[x], ds[y])] += 1

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(texts, ["doc_id", "text"]).write.mode(
            "overwrite"
        ).parquet(d + "/documents.parquet")
        old = dd.SUB_K
        dd.SUB_K = k
        try:
            got = {
                (r.a_id, r.b_id): r.n_shared
                for r in dedup_substring_pairs(spark, d).collect()
            }
        finally:
            dd.SUB_K = old
    assert got == dict(expected), (texts, got, dict(expected))
