"""Opt-in scale smoke: replicate lineitem sf0.1 16× (~9.6M rows) in /tmp and
run the headline aggregation / validation / dedup-sketch paths. Guards
against accidentally-quadratic plans that small SFs hide.

Run with: SPARK_GRAFT_SCALE_TEST=1 python -m pytest tests/test_scale_smoke.py
(skipped by default — it writes ~300 MB under /tmp and takes ~2 min).
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TEST") != "1",
    reason="set SPARK_GRAFT_SCALE_TEST=1 to run the 10M-row smoke",
)

SF_DIR = "/root/testdata/sf0.1"
REPL = 16


@pytest.fixture(scope="module")
def big_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("scale")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    big = (
        li.withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(REPL)])))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * 10_000_000)
        .drop("rep")
    )
    big.write.mode("overwrite").parquet(str(d / "lineitem.parquet"))
    return str(d)


def test_flagship_at_10m(spark, big_dir):
    import time

    from clickhousemigrators3_spark.operators.relational import (
        flagship_partition_rollup,
    )

    t0 = time.perf_counter()
    rows = flagship_partition_rollup(spark, big_dir).collect()
    dt = time.perf_counter() - t0
    assert len(rows) == 83
    assert sum(r["row_cnt"] for r in rows) == 600_000 * REPL
    assert dt < 60, f"flagship at 10M rows took {dt:.1f}s"


def test_validation_join_at_10m(spark, big_dir):
    import time

    from pyspark.sql import functions as F

    from clickhousemigrators3_spark.operators.validate import count_validation

    src = spark.read.parquet(f"{big_dir}/lineitem.parquet")
    dst = src.filter(F.col("l_orderkey") % 1000 != 0)
    t0 = time.perf_counter()
    v = count_validation(src, dst, ["l_returnflag", "l_linestatus"]).collect()
    dt = time.perf_counter() - t0
    assert len(v) == 6
    assert all(not r["passed"] for r in v)  # every partition lost rows
    assert dt < 60, f"validation at 10M rows took {dt:.1f}s"


@pytest.fixture(scope="module")
def big_docs_dir(spark, tmp_path_factory):
    """documents ×8 with IDENTICAL text per replica — the hot-bucket worst
    case for LSH (every doc now has ≥7 exact near-dups)."""
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("scale_docs")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = (
        docs.withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(8)])))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
        .drop("rep")
    )
    big.write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_minhash_lsh_at_40k_docs_hot_buckets(spark, big_docs_dir):
    """40k docs where every LSH bucket holds 8 replicas of each member:
    candidate fan-in is the stress, and the plan must stay sub-quadratic.
    Every cross-replica pair is an exact dup (jaccard 1.0), so the output
    must contain >= C(8,2) * n_docs such pairs — a correctness check that
    the banding loses nothing under maximal bucket pressure."""
    import time

    from clickhousemigrators3_spark.operators.dedup import dedup_minhash_lsh_pairs

    t0 = time.perf_counter()
    n = dedup_minhash_lsh_pairs(spark, big_docs_dir).count()
    dt = time.perf_counter() - t0
    assert n >= 28 * 5000  # C(8,2) replica pairs per original doc
    assert dt < 120, f"LSH at 40k docs took {dt:.1f}s"


def test_salted_agg_at_10m_hot_key(spark, big_dir):
    """Two-phase salted count at 10M rows with 50% of them on one key:
    result must equal the plain groupBy, inside the time bound."""
    import time

    from pyspark.sql import functions as F

    from clickhousemigrators3_spark.functions.skew import salted_agg_count

    li = spark.read.parquet(f"{big_dir}/lineitem.parquet").select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(-1).cast("long"))
        .otherwise(F.col("l_orderkey"))
        .alias("hot_key")
    )
    t0 = time.perf_counter()
    salted = salted_agg_count(li, "hot_key", n_salts=8)
    hot = salted.filter(F.col("hot_key") == -1).collect()[0]["cnt"]
    dt = time.perf_counter() - t0
    plain = li.filter(F.col("hot_key") == -1).count()
    assert hot == plain
    assert dt < 60, f"salted agg at 10M rows took {dt:.1f}s"


def test_sliding_funnel_at_800k_events(spark, tmp_path_factory):
    """events ×8 with disjoint user populations per replica: per-user
    history is unchanged, so the funnel histogram must scale EXACTLY 8× —
    and per-user window state stays constant."""
    import time

    from pyspark.sql import functions as F

    from clickhousemigrators3_spark.operators.event_analytics import (
        ev_window_funnel_sliding,
    )

    d = tmp_path_factory.mktemp("scale_events")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    big = (
        ev.withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(8)])))
        .withColumn("user_id", F.col("user_id") + F.col("rep") * 10_000_000)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 100_000_000)
        .drop("rep")
    )
    big.write.mode("overwrite").parquet(str(d / "events.parquet"))

    base = {
        r["step"]: r["n_users"] for r in ev_window_funnel_sliding(spark, SF_DIR).collect()
    }
    t0 = time.perf_counter()
    scaled = {
        r["step"]: r["n_users"]
        for r in ev_window_funnel_sliding(spark, str(d)).collect()
    }
    dt = time.perf_counter() - t0
    assert scaled == {k: v * 8 for k, v in base.items()}
    assert dt < 60, f"sliding funnel at 800k events took {dt:.1f}s"


def test_repeated_spans_at_16x(spark, tmp_path_factory):
    """Span-dedup smoke at 16× documents (~80k docs): replication turns
    EVERY span into a cross-doc repeat, so the output must equal the
    distinct-span count — and the runtime must stay explode+groupBy linear,
    not pairwise."""
    import time

    from pyspark.sql import functions as F

    from clickhousemigrators3_spark.operators.dedup import (
        SPAN_N,
        dedup_repeated_spans,
    )
    from clickhousemigrators3_spark.functions.text import word_shingles

    d = tmp_path_factory.mktemp("scale_docs")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = (
        docs.withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(REPL)])))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
        .drop("rep")
    )
    big.write.mode("overwrite").parquet(str(d / "documents.parquet"))

    distinct_spans = (
        docs.select(F.explode(word_shingles(F.col("text"), SPAN_N)).alias("s"))
        .distinct()
        .count()
    )
    t0 = time.perf_counter()
    n = dedup_repeated_spans(spark, str(d)).count()
    dt = time.perf_counter() - t0
    assert n == distinct_spans
    assert dt < 90, f"repeated spans at 16x docs took {dt:.1f}s"


@pytest.fixture(scope="module")
def big_emb_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("scale_emb")
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    big = (
        e.withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(REPL)])))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * 1_000_000)
        .drop("rep")
    )
    big.write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_kmeans_training_at_32k_vectors(spark, big_emb_dir):
    """Topology guard for the single-plan Lloyd trainer (_lloyd_unrolled):
    16x the corpus must train in ~O(n) wall clock — the corpus never
    shuffles (only KxDIM mean rows do), so a blow-up here would mean a
    corpus-wide exchange or a quadratic step crept back in."""
    import time

    from clickhousemigrators3_spark.operators.embeddings_ops import (
        K_CLUSTERS,
        _lloyd_unrolled,
    )

    t0 = time.time()
    assign, cent, _ = _lloyd_unrolled(spark, big_emb_dir)
    n = assign.count()
    dt = time.time() - t0
    assert n == 2000 * REPL
    assert cent.count() == K_CLUSTERS
    assert dt < 60, f"16x training took {dt:.1f}s — corpus-shuffle regression?"


def test_fused_assign_training_at_32k_vectors(spark, big_emb_dir):
    """Same topology guard for the FUSED trainer (_lloyd_assign_unrolled —
    the production path behind kmeans_lloyd_clusters and
    semdedup_prune_trained): one job, corpus never shuffles, and its
    assignment matches the collect-then-assign twin exactly."""
    import time

    from clickhousemigrators3_spark.operators.embeddings_ops import (
        _lloyd_assign_unrolled,
        _lloyd_unrolled,
    )

    t0 = time.time()
    fused = _lloyd_assign_unrolled(spark, big_emb_dir)
    n = fused.count()
    dt = time.time() - t0
    assert n == 2000 * REPL
    assert dt < 60, f"16x fused training took {dt:.1f}s"
    twin, _, _ = _lloyd_unrolled(spark, big_emb_dir)
    diff = (
        fused.select("vec_id", "cluster")
        .exceptAll(twin.select("vec_id", "cluster"))
        .count()
    )
    assert diff == 0


def test_roc_auc_at_800k_events(spark, tmp_path_factory):
    """events ×8 (every row duplicated 8 times within its day): the
    rank-sum AUC is invariant under whole-sample replication — pairwise
    win probability is unchanged while n_pos/n_neg scale 8× — so per-day
    AUC must match the base run exactly while the window carries 8× the
    rows. Guards the one-exchange window plan at scale."""
    import time

    from pyspark.sql import functions as F

    from clickhousemigrators3_spark.operators.mleval import ml_roc_auc_daily

    d = tmp_path_factory.mktemp("scale_auc")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    big = (
        ev.withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(8)])))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 100_000_000)
        .drop("rep")
    )
    big.write.mode("overwrite").parquet(str(d / "events.parquet"))

    base = {r["day"]: r for r in ml_roc_auc_daily(spark, SF_DIR).collect()}
    t0 = time.perf_counter()
    scaled = {r["day"]: r for r in ml_roc_auc_daily(spark, str(d)).collect()}
    dt = time.perf_counter() - t0
    assert set(scaled) == set(base)
    for day, b in base.items():
        s = scaled[day]
        assert s.n_pos == b.n_pos * 8 and s.n_neg == b.n_neg * 8
        assert abs(s.roc_auc - b.roc_auc) < 2e-6, (day, s.roc_auc, b.roc_auc)
    assert dt < 60, f"roc_auc at 800k events took {dt:.1f}s"


def test_bm25_at_40k_docs(spark, big_docs_dir):
    """BM25 at 8× corpus: the postings shuffle is term-filtered, so wall
    time must stay linear-ish; replicated docs tie on score and the
    doc_id tiebreak keeps the top-10 deterministic."""
    import time

    from clickhousemigrators3_spark.operators.textops import text_bm25_topk

    t0 = time.perf_counter()
    rows = text_bm25_topk(spark, big_docs_dir).collect()
    dt = time.perf_counter() - t0
    assert len(rows) == 10
    assert all(rows[i].bm25 >= rows[i + 1].bm25 for i in range(9))
    assert dt < 60, f"bm25 at 40k docs took {dt:.1f}s"


def test_hybrid_rrf_at_8x(spark, big_docs_dir, tmp_path_factory):
    """Hybrid RRF at 8× (documents replicated, embeddings replicated with
    distinct ids): fusion stays a bounded-candidate join; output is the
    fixed top-10 with both rank columns populated or null, never both
    null."""
    import time

    from pyspark.sql import functions as F

    from clickhousemigrators3_spark.operators.similarity import hybrid_rrf_topk

    d = big_docs_dir
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    big_e = (
        emb.withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(8)])))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * 10_000_000)
        .drop("rep")
    )
    big_e.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    t0 = time.perf_counter()
    rows = hybrid_rrf_topk(spark, d).collect()
    dt = time.perf_counter() - t0
    assert len(rows) == 10
    assert all(r.lex_rank is not None or r.vec_rank is not None for r in rows)
    assert dt < 90, f"hybrid rrf at 8x took {dt:.1f}s"


def test_substring_dedup_at_8x(spark, tmp_path_factory):
    """Cross-doc substring dedup smoke at 8× documents: replicas of the
    same doc share every span, so first-writer-wins retention must keep
    exactly one replica family's worth of span-bearing docs — and the
    runtime must stay bucket-bounded (fingerprint groupBy + capped-df
    join), never all-pairs."""
    import time

    from pyspark.sql import functions as F

    from clickhousemigrators3_spark.operators.dedup import (
        SUB_K,
        dedup_substring_retained,
    )
    from clickhousemigrators3_spark.functions.text import word_shingles

    rep = max(2, REPL // 2)  # 8× documents
    d = tmp_path_factory.mktemp("scale_sub")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = (
        docs.withColumn(
            "rep", F.explode(F.array(*[F.lit(i) for i in range(rep)]))
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
        .drop("rep")
    )
    big.write.mode("overwrite").parquet(str(d / "documents.parquet"))

    base_retained = dedup_substring_retained(
        spark, SF_DIR
    ).count()
    n_docs = docs.count()
    t0 = time.perf_counter()
    got = dedup_substring_retained(spark, str(d)).count()
    dt = time.perf_counter() - t0
    # every replica beyond the first generation is dropped (it shares all
    # its spans with the generation-0 twin); span-less short docs survive
    # in every generation
    spanless = (
        docs.select(
            F.size(word_shingles(F.col("text"), SUB_K)).alias("n")
        ).filter(F.col("n") == 0).count()
    )
    assert got == base_retained + (rep - 1) * spanless, (
        got, base_retained, spanless
    )
    assert got < n_docs * rep
    assert dt < 120, f"substring retention at {rep}x docs took {dt:.1f}s"


def test_stored_substring_index_drive_at_8x(spark, tmp_path_factory):
    """The PRODUCTION path for incremental substring dedup at scale: the
    old corpus's span fingerprints live in the persisted index (parquet,
    nothing cached) and the crawl drop dedups against the STORED table —
    at 8× documents the drive must (a) exactly match the emulated twin
    ``dedup_substring_incremental_retained`` (which recomputes the old
    side per run and caches the corpus-sized fp relation), and (b) stay
    delta-bounded in wall clock. Round-10 verdict #3: the emulated twin's
    corpus-sized persist is the fixture-scale convenience; THIS drive is
    what runs at 100 TB."""
    import time

    from pyspark.sql import functions as F

    from clickhousemigrators3_spark.operators.dedup import (
        INC_MOD,
        dedup_substring_incremental_retained,
    )
    from clickhousemigrators3_spark.operators.dedup_index import (
        build_dedup_index,
        dedup_delta_substring_retained,
    )

    rep = max(2, REPL // 2)  # 8× documents
    d = tmp_path_factory.mktemp("scale_subidx")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = (
        docs.withColumn(
            "rep", F.explode(F.array(*[F.lit(i) for i in range(rep)]))
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
        .drop("rep")
    )
    big.write.mode("overwrite").parquet(str(d / "documents.parquet"))
    big = spark.read.parquet(str(d / "documents.parquet"))

    is_new = F.col("doc_id") % INC_MOD == 0
    index_dir = str(d / "index")
    # bootstrap the index from the old corpus (untimed: this is the
    # once-per-corpus cost the incremental contract amortizes away)
    assert build_dedup_index(
        spark, big.filter(~is_new), index_dir, "s0"
    ) is True

    t0 = time.perf_counter()
    got = dedup_delta_substring_retained(
        spark, big.filter(is_new), index_dir
    ).count()
    dt = time.perf_counter() - t0
    want = dedup_substring_incremental_retained(spark, str(d)).count()
    assert got == want
    assert dt < 90, f"stored substring drive at {rep}x took {dt:.1f}s"
