"""Semantic invariants of the curation / event-pattern operators — checks
the oracle comparison can't express (cross-query consistency, structural
properties of intervals and chunks)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_chunking_covers_every_word_once_per_stride(spark):
    from clickhousemigrators3_spark.operators.curation import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        doc_chunk_overlap,
    )
    from clickhousemigrators3_spark.catalog import load_table

    chunks = doc_chunk_overlap(spark, SF_DIR)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
            F.min("n_chunk_words").alias("min_w"),
            F.max("n_chunk_words").alias("max_w"),
            F.sum("n_chunk_words").alias("sum_w"),
        )
        .collect()
    )
    words = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF_DIR, "documents")
        .filter(F.trim("text") != "")
        .select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .collect()
    }
    assert per_doc and len(per_doc) == len(words)
    for r in per_doc:
        n = words[r["doc_id"]]
        # chunk starts are 0, stride, … < n_words
        assert r["n_chunks"] == math.ceil(n / CHUNK_STRIDE)
        assert r["max_idx"] == r["n_chunks"] - 1
        assert 1 <= r["min_w"] and r["max_w"] <= CHUNK_SIZE
        # total chunked words ≥ source words (overlap duplicates some)
        assert r["sum_w"] >= n


def test_quantization_codes_bounded_and_scale_consistent(spark):
    from clickhousemigrators3_spark.operators.curation import embedding_quantize_int8

    rows = embedding_quantize_int8(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -127 <= r["q_min"] <= r["q_max"] <= 127
        assert r["scale"] >= 0


def test_mixture_weights_form_a_distribution(spark):
    from clickhousemigrators3_spark.operators.curation import mixture_domain_weights

    rows = mixture_domain_weights(spark, SF_DIR).collect()
    k = len(rows)
    assert abs(sum(r["actual_frac"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        # weight is defined as (1/k) / actual_frac — resampling by it
        # equalizes the mixture
        assert abs(r["weight"] * r["actual_frac"] - 1.0 / k) < 1e-3


def test_scd2_intervals_chain_with_one_open_row(spark):
    from clickhousemigrators3_spark.operators.curation import (
        scd2_customer_price_history,
    )

    rows = scd2_customer_price_history(spark, SF_DIR).collect()
    by_cust: dict = {}
    for r in rows:
        by_cust.setdefault(r["customer_id"], []).append(r)
    assert by_cust
    for hist in by_cust.values():
        # exactly one current row, and it is the last interval
        assert sum(1 for r in hist if r["is_current"]) == 1
        assert hist[-1]["is_current"] and hist[-1]["valid_to"] is None
        for prev, nxt in zip(hist, hist[1:]):
            # intervals chain: [from, to) with to == next.from, strictly increasing
            assert prev["valid_to"] == nxt["valid_from"]
            assert prev["valid_from"] < nxt["valid_from"]


def test_asof_directions_agree_with_bruteforce(spark):
    from clickhousemigrators3_spark.catalog import load_table
    from clickhousemigrators3_spark.operators.asof import (
        asof_join_last_click,
        asof_join_next_view,
    )

    e = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    rows = e.collect()
    clicks: dict = {}
    views: dict = {}
    purchases = []
    for r in rows:
        if r["event_type"] == "click":
            clicks.setdefault(r["user_id"], []).append((r["ts"], r["value"]))
        elif r["event_type"] == "view":
            views.setdefault(r["user_id"], []).append((r["ts"], r["value"]))
        elif r["event_type"] == "purchase":
            purchases.append(r)

    back = {r["event_id"]: r["last_click_value"] for r in asof_join_last_click(spark, SF_DIR).collect()}
    fwd = {r["event_id"]: r["next_view_value"] for r in asof_join_next_view(spark, SF_DIR).collect()}
    assert len(back) == len(purchases) == len(fwd)
    for p in purchases:
        earlier = [(t, v) for t, v in clicks.get(p["user_id"], []) if t < p["ts"]]
        later = [(t, v) for t, v in views.get(p["user_id"], []) if t > p["ts"]]
        assert back[p["event_id"]] == (max(earlier)[1] if earlier else None)
        assert fwd[p["event_id"]] == (min(later)[1] if later else None)


def test_sequence_match_consistent_with_count(spark):
    from clickhousemigrators3_spark.operators.event_analytics import (
        ev_sequence_count,
        ev_sequence_match,
    )

    matched = {
        r["user_id"]: r["matched"] for r in ev_sequence_match(spark, SF_DIR).collect()
    }
    counts = {
        r["user_id"]: r["n_matches"] for r in ev_sequence_count(spark, SF_DIR).collect()
    }
    assert matched and set(matched) == set(counts)
    for uid, m in matched.items():
        assert m == (counts[uid] >= 1)


def test_sliding_funnel_matches_bruteforce(spark):
    """ev_window_funnel_sliding's running-max reduction vs the literal
    exists-any-chain triple join, computed independently on sf0.001. The
    oracle runs the same reduction as the Spark query, so this is the check
    that the REDUCTION itself is right, not just engine parity."""
    from pyspark.sql import functions as F

    from clickhousemigrators3_spark.catalog import load_table
    from clickhousemigrators3_spark.operators.event_analytics import (
        FUNNEL_WINDOW_HOURS,
        ev_window_funnel_sliding,
    )

    got = {
        r["step"]: r["n_users"]
        for r in ev_window_funnel_sliding(spark, SF_DIR).collect()
    }

    e = load_table(spark, SF_DIR, "events").select("user_id", "ts", "event_type")
    win = F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")
    v = e.filter(F.col("event_type") == "view").select("user_id", F.col("ts").alias("vt"))
    c = e.filter(F.col("event_type") == "click").select("user_id", F.col("ts").alias("ct"))
    p = e.filter(F.col("event_type") == "purchase").select("user_id", F.col("ts").alias("pt"))

    s1 = v.select("user_id").distinct()
    s2 = (
        v.join(c, "user_id")
        .filter((F.col("ct") > F.col("vt")) & (F.col("ct") <= F.col("vt") + win))
        .select("user_id")
        .distinct()
    )
    s3 = (
        v.join(c, "user_id")
        .join(p, "user_id")
        .filter(
            (F.col("ct") > F.col("vt"))
            & (F.col("pt") > F.col("ct"))
            & (F.col("pt") <= F.col("vt") + win)
        )
        .select("user_id")
        .distinct()
    )
    all_users = e.select("user_id").distinct()
    n1, n2, n3, n = s1.count(), s2.count(), s3.count(), all_users.count()
    expected = {3: n3, 2: n2 - n3, 1: n1 - n2, 0: n - n1}
    expected = {k: v for k, v in expected.items() if v > 0}
    assert got == expected


def test_peak_concurrency_matches_bruteforce(spark):
    """ev_peak_concurrency_hourly's carry-in + per-hour prefix decomposition
    vs the literal definition: for every boundary instant t, concurrency =
    #sessions with s <= t <= e; peak(H) = max over instants in H (or the
    hour-start carry level for event-free hours). The oracle runs the same
    decomposition as the Spark query, so this independent quadratic check
    is what validates the decomposition itself."""
    from pyspark.sql import functions as F

    from clickhousemigrators3_spark.operators.events import (
        ev_peak_concurrency_hourly,
        ev_sessionization,
    )

    got = {
        r["hour"]: r["peak_concurrency"]
        for r in ev_peak_concurrency_hourly(spark, SF_DIR).collect()
    }

    iv = [
        (r["session_start"], r["session_end"])
        for r in ev_sessionization(spark, SF_DIR).collect()
    ]
    # brute force in plain Python at sf0.001 (few thousand sessions)
    import datetime

    def floor_hour(t):
        return t.replace(minute=0, second=0, microsecond=0)

    expected = {}
    # concurrency at every boundary instant, attributed to its hour
    for t, _ in [(s, 1) for s, _e in iv] + [(e, -1) for _s, e in iv]:
        c = sum(1 for s, e in iv if s <= t <= e)
        h = floor_hour(t)
        expected[h] = max(expected.get(h, 0), c)
    # hours with no boundaries: concurrency is flat = carry level
    lo = floor_hour(min(s for s, _ in iv))
    hi = floor_hour(max(e for _, e in iv))
    h = lo
    while h <= hi:
        if h not in expected:
            expected[h] = sum(1 for s, e in iv if s < h <= e)
        h += datetime.timedelta(hours=1)

    assert got == expected


def test_bloom_decontamination_never_under_drops(spark):
    """Bloom filters have no false negatives: every gram the exact join
    flags is bloom-positive, so per doc bloom_hits >= overlap_grams and
    the bloom retained set is a SUBSET of the exact retained set (false
    positives can only over-drop — the conservative direction for
    decontamination)."""
    from clickhousemigrators3_spark.operators.traindata import (
        text_decontaminated_retained,
        text_decontamination_bloom_retained,
    )

    exact = {
        r.doc_id
        for r in text_decontaminated_retained(spark, SF_DIR).collect()
    }
    bloom = {
        r.doc_id
        for r in text_decontamination_bloom_retained(spark, SF_DIR).collect()
    }
    assert bloom <= exact
    # sanity: the gate keeps a real corpus, not an empty one
    assert len(bloom) > 0


def test_bloom_sizing_knobs_and_fp_rate_formula(spark):
    """Round-11 verdict #5: (m, k) are caller-sizable, and the measured
    false-positive rate tracks the textbook formula
    fp ≈ (1 − e^(−k·n/m))^k. With md5-derived hashes the measurement is
    DETERMINISTIC for a fixed gram set, so the band asserted here
    (formula/3 ≤ measured ≤ 2×formula) is a stable property, not a flaky
    sample. Also: a filter built at (m, k) probed at the same (m, k)
    keeps the no-false-negative guarantee."""
    import math

    from pyspark.sql import functions as F

    from clickhousemigrators3_spark.operators.traindata import (
        bloom_filter_from_grams,
        _bloom_positions,
    )

    m_bits, k, n_members, n_probes = 8192, 3, 1000, 3000
    members = spark.range(n_members).select(
        F.concat(F.lit("member-"), F.col("id")).alias("g")
    )
    bloom = bloom_filter_from_grams(members, m_bits, k)
    words = bloom.count()
    assert words <= m_bits // 32  # constant-size regardless of input

    # non-member probes: k-for-k positive == false positive
    probes = spark.range(n_probes).select(
        F.concat(F.lit("absent-"), F.col("id")).alias("g")
    )
    hits = (
        _bloom_positions(probes, m_bits, k)
        .join(F.broadcast(bloom), "word", "left")
        .groupBy("g")
        .agg(
            F.sum(
                F.when(
                    F.col("bits").isNotNull()
                    & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")),
                    1,
                ).otherwise(0)
            ).alias("set_bits")
        )
        .filter(F.col("set_bits") == k)
        .count()
    )
    measured = hits / n_probes
    formula = (1 - math.exp(-k * n_members / m_bits)) ** k  # ≈ 0.029
    assert measured <= 2 * formula, (measured, formula)
    assert measured >= formula / 3, (measured, formula)

    # no false negatives at the custom (m, k): every member is k-for-k
    # positive through the same probe path
    neg = (
        _bloom_positions(members, m_bits, k)
        .join(F.broadcast(bloom), "word", "left")
        .groupBy("g")
        .agg(
            F.sum(
                F.when(
                    F.col("bits").isNotNull()
                    & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")),
                    1,
                ).otherwise(0)
            ).alias("set_bits")
        )
        .filter(F.col("set_bits") < k)
        .count()
    )
    assert neg == 0


def test_published_bloom_carries_its_sizing(spark, tmp_path):
    """publish_decontamination_bloom stamps (m, k) into the artifact and
    read_decontamination_bloom recovers them, so a probe never has to
    trust the caller to repeat the publisher's sizing."""
    from clickhousemigrators3_spark.operators.traindata import (
        publish_decontamination_bloom,
        read_decontamination_bloom,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "bloom")
    publish_decontamination_bloom(docs, path, bits=4096, k=2)
    bloom, m, k = read_decontamination_bloom(spark, path)
    assert (m, k) == (4096, 2)
    assert set(bloom.columns) == {"word", "bits"}
    assert 0 < bloom.count() <= 4096 // 32
