"""Persisted incremental dedup index (operators/dedup_index.py): two
successive crawl drops driven through the STORED index — exact and
near-dup gates against the accumulated corpus, index growth between drops,
and replay idempotence of every publish."""

from __future__ import annotations

import pytest

from clickhousemigrators3_spark.operators.dedup_index import (
    INDEX_TABLES,
    build_dedup_index,
    dedup_delta_retained,
    update_dedup_index,
    _published,
)

T = {
    0: "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima",
    1: "math physics chemistry biology geology astronomy botany zoology ecology genetics anatomy taxonomy",
    2: "red orange yellow green blue indigo violet crimson scarlet amber teal maroon navy olive silver gold bronze copper pearl onyx",
    3: "spark shuffle partition broadcast executor driver catalyst tungsten codegen arrow parquet predicate",
    4: "north south east west up down left right forward backward inward outward",
}
# near-dup of T[2]: ONE word changed in 20 → shingle Jaccard ~0.9
NEAR2 = T[2].replace("onyx", "jade")
FRESH1 = "one unique sentence about gardening tulips roses daisies orchids ferns mosses lichens"
FRESH2 = "completely different prose covering sailing knots rigging anchors harbors tides currents buoys"
FRESH3 = "final novel text mentioning telescopes lenses mirrors apertures filters mounts tripods oculars"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture()
def index_dir(tmp_path):
    return str(tmp_path / "dedup_index")


def _counts(spark, index_dir):
    return {
        t: _published(spark, index_dir, t).count() for t in INDEX_TABLES
    }


def test_two_crawl_drops_through_stored_index(spark, index_dir):
    base = _docs(spark, [(i, T[i]) for i in range(5)])
    assert build_dedup_index(spark, base, index_dir, "s0") is True
    c0 = _counts(spark, index_dir)
    assert c0["dedup_fp"] == 5 and c0["dedup_perdoc"] == 5
    assert c0["dedup_bands"] == 5 * 4  # 4 bands per doc

    # drop 1: one exact dup of the base, one near-dup (LSH gate), two fresh
    drop1 = _docs(
        spark,
        [(10, T[1]), (11, NEAR2), (12, FRESH1), (13, FRESH2)],
    )
    retained1 = dedup_delta_retained(spark, drop1, index_dir)
    assert [r.doc_id for r in retained1.collect()] == [12, 13]

    docs1 = drop1.join(retained1, "doc_id", "semi")
    assert update_dedup_index(spark, docs1, index_dir, "s1") is True
    c1 = _counts(spark, index_dir)
    assert c1["dedup_fp"] == 7  # 5 base + 2 retained

    # drop 2: exact dup of a DROP-1 retained doc (the index grew), exact
    # dup of a base doc, one fresh
    drop2 = _docs(spark, [(20, FRESH1), (21, T[0]), (22, FRESH3)])
    retained2 = dedup_delta_retained(spark, drop2, index_dir)
    assert [r.doc_id for r in retained2.collect()] == [22]

    docs2 = drop2.join(retained2, "doc_id", "semi")
    assert update_dedup_index(spark, docs2, index_dir, "s2") is True
    c2 = _counts(spark, index_dir)
    assert c2["dedup_fp"] == 8


def test_index_update_is_idempotent_on_replay(spark, index_dir):
    base = _docs(spark, [(i, T[i]) for i in range(3)])
    assert build_dedup_index(spark, base, index_dir, "s0") is True
    # replaying the SAME snapshot is a no-op: no new version, no dup rows
    assert build_dedup_index(spark, base, index_dir, "s0") is False
    c0 = _counts(spark, index_dir)

    delta = _docs(spark, [(10, FRESH1)])
    retained = dedup_delta_retained(spark, delta, index_dir)
    assert update_dedup_index(spark, delta.join(retained, "doc_id", "semi"),
                              index_dir, "s1") is True
    c1 = _counts(spark, index_dir)
    assert c1["dedup_fp"] == c0["dedup_fp"] + 1
    # crashed-and-retried ingest of the same drop: counts unchanged
    assert update_dedup_index(spark, delta, index_dir, "s1") is False
    assert _counts(spark, index_dir) == c1


def test_missing_index_fails_loud(spark, index_dir):
    delta = _docs(spark, [(1, FRESH1)])
    with pytest.raises(FileNotFoundError, match="build_dedup_index"):
        dedup_delta_retained(spark, delta, index_dir).collect()


def test_stream_dedup_ingest_two_drops(spark, index_dir, tmp_path):
    """Streaming twin: two crawl-drop files drain through foreachBatch,
    each deduped against the index as updated by the PREVIOUS batch; a
    restart against the same checkpoint ingests nothing twice."""
    import time as _time

    from clickhousemigrators3_spark.streaming.ingest import stream_dedup_ingest

    base = _docs(spark, [(i, T[i]) for i in range(5)])
    assert build_dedup_index(spark, base, index_dir, "s0") is True

    src = str(tmp_path / "drops")
    # one file per drop; distinct mtimes keep the processing order stable
    _docs(spark, [(10, T[1]), (11, FRESH1)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _time.sleep(1.1)
    # 20 duplicates drop-1's retained FRESH1 — only the stored index
    # updated between batches can catch it
    _docs(spark, [(20, FRESH1), (21, FRESH2)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out = str(tmp_path / "retained")
    ckpt = str(tmp_path / "ckpt")
    stream_dedup_ingest(spark, src, index_dir, out, ckpt)

    got = sorted(
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    )
    # 10 dups base T[1]; 20 dups the earlier-retained FRESH1
    assert got == [11, 21]
    c = _counts(spark, index_dir)
    assert c["dedup_fp"] == 7  # 5 base + 11 + 21

    # restart against the same checkpoint: nothing reprocessed
    stream_dedup_ingest(spark, src, index_dir, out, ckpt)
    got2 = sorted(
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert got2 == [11, 21]
    assert _counts(spark, index_dir) == c


def test_crash_between_write_and_publish_keeps_old_version(
    spark, index_dir, monkeypatch
):
    """Fail-fast ordering: data lands fully before ANY manifest flips, so
    a crash mid-publish leaves every reader on the old version; the retry
    converges."""
    import clickhousemigrators3_spark.operators.dedup_index as di

    base = _docs(spark, [(i, T[i]) for i in range(3)])
    assert build_dedup_index(spark, base, index_dir, "s0") is True
    c0 = _counts(spark, index_dir)

    real_publish = di.publish_manifest
    calls = {"n": 0}

    def crashing_publish(dest_dir, table, data_path):
        calls["n"] += 1
        if calls["n"] == 2:  # first manifest flips, second crashes
            raise OSError("simulated crash mid-publish")
        return real_publish(dest_dir, table, data_path)

    delta = _docs(spark, [(10, FRESH1)])
    monkeypatch.setattr(di, "publish_manifest", crashing_publish)
    with pytest.raises(OSError, match="simulated crash"):
        update_dedup_index(spark, delta, index_dir, "s1")
    monkeypatch.setattr(di, "publish_manifest", real_publish)

    # the table whose manifest DID flip shows the new version; the others
    # still read the old one — but a retry of the same snapshot converges
    # all three (per-table publish is idempotent on identical paths)
    assert update_dedup_index(spark, delta, index_dir, "s1") is True
    c1 = _counts(spark, index_dir)
    assert c1["dedup_fp"] == c0["dedup_fp"] + 1
    assert c1["dedup_perdoc"] == c0["dedup_perdoc"] + 1
    assert c1["dedup_bands"] == c0["dedup_bands"] + 4


def _data_files(index_dir):
    """(path → (size, mtime)) of every parquet data file under index_dir."""
    import os

    out = {}
    for root, _dirs, files in os.walk(index_dir):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
    return out


def test_update_writes_are_delta_sized(spark, index_dir):
    """Round-9 verdict #1: the second crawl drop must write DELTA-sized
    data — new files only under the new snapshot's prefixes, row counts
    equal to the delta's own relations, and not one pre-existing byte
    rewritten. The old design unioned old+delta and rewrote the whole
    corpus-sized table per snapshot."""
    # 200-doc base corpus vs a 2-doc delta: corpus-sized rewrites would be
    # two orders of magnitude larger than the delta
    base = _docs(
        spark,
        [(i, f"base document number {i} with words "
             f"{' '.join(f'w{i}x{j}' for j in range(12))}")
         for i in range(200)],
    )
    assert build_dedup_index(spark, base, index_dir, "s0") is True
    before = _data_files(index_dir)

    delta = _docs(spark, [(1000, FRESH1), (1001, FRESH2)])
    retained = dedup_delta_retained(spark, delta, index_dir)
    assert sorted(r.doc_id for r in retained.collect()) == [1000, 1001]
    assert update_dedup_index(
        spark, delta.join(retained, "doc_id", "semi"), index_dir, "s1"
    ) is True

    after = _data_files(index_dir)
    # not one pre-existing data file was rewritten, resized, or deleted
    assert all(after.get(p) == meta for p, meta in before.items())
    new_files = {p for p in after if p not in before}
    assert new_files, "the update wrote no new data at all"
    # every new file lives under a __s1 snapshot prefix
    assert all("__s1" in p for p in new_files)
    # and the __s1 prefixes hold exactly the delta's rows: 2 fingerprints,
    # 2 per-doc signatures, 2×4 band rows — not the 200-doc corpus
    for t, want_rows in (("dedup_fp", 2), ("dedup_perdoc", 2),
                         ("dedup_bands", 8)):
        got = spark.read.parquet(f"{index_dir}/{t}__s1").count()
        assert got == want_rows, (t, got)
    # the published view still unions base + delta
    assert _counts(spark, index_dir)["dedup_fp"] == 202


def test_compact_folds_chain_and_preserves_results(spark, index_dir):
    """compact_dedup_index folds the live snapshot chain into one prefix:
    counts and retained-query results unchanged, manifests single-path,
    replay of the same compaction id a no-op, id reuse over a grown chain
    refused (it would overwrite a published prefix in place)."""
    from clickhousemigrators3_spark.operators.dedup_index import (
        _live_paths,
        compact_dedup_index,
    )

    base = _docs(spark, [(i, T[i]) for i in range(5)])
    assert build_dedup_index(spark, base, index_dir, "s0") is True
    for snap, doc in (("s1", (10, FRESH1)), ("s2", (11, FRESH2))):
        d = _docs(spark, [doc])
        r = dedup_delta_retained(spark, d, index_dir)
        assert update_dedup_index(
            spark, d.join(r, "doc_id", "semi"), index_dir, snap
        ) is True
    assert len(_live_paths(index_dir, "dedup_fp")) == 3
    c_before = _counts(spark, index_dir)

    probe = _docs(spark, [(20, FRESH1), (21, FRESH3)])
    retained_before = sorted(
        r.doc_id for r in dedup_delta_retained(spark, probe, index_dir).collect()
    )
    assert retained_before == [21]  # 20 dups the s1-retained FRESH1

    assert compact_dedup_index(spark, index_dir, "c0") is True
    assert all(
        len(_live_paths(index_dir, t)) == 1 for t in INDEX_TABLES
    )
    assert _counts(spark, index_dir) == c_before
    retained_after = sorted(
        r.doc_id for r in dedup_delta_retained(spark, probe, index_dir).collect()
    )
    assert retained_after == retained_before
    # replaying the same compaction id is a no-op
    assert compact_dedup_index(spark, index_dir, "c0") is False
    # …but reusing it after the chain grows again is refused loudly
    d = _docs(spark, [(30, FRESH3)])
    r = dedup_delta_retained(spark, d, index_dir)
    assert update_dedup_index(
        spark, d.join(r, "doc_id", "semi"), index_dir, "s3"
    ) is True
    with pytest.raises(ValueError, match="already used"):
        compact_dedup_index(spark, index_dir, "c0")


# substring modality: a text sharing one verbatim SUB_K(=12)-word span
SPAN = "quick brown foxes jump over lazy dogs near quiet rivers at dawn"
SUB_A = f"opening words then {SPAN} and a distinct tail here"
SUB_B = f"totally different head before {SPAN} plus another unique ending"
SUB_CLEAN = ("no shared dozen word run appears anywhere inside this "
             "sentence because every token is chosen to be unique enough")


def test_dedup_substring_index_two_drops(spark, index_dir):
    """The stored-index drive the dedup.py docstring cites: span
    fingerprints persist in the index (dedup_subfp), a crawl drop's docs
    drop on any span shared with the STORED corpus, survivors append
    O(delta), and the NEXT drop is caught by spans indexed by the
    previous one."""
    from clickhousemigrators3_spark.operators.dedup_index import (
        dedup_delta_substring_retained,
    )

    base = _docs(spark, [(0, SUB_A), (1, T[1]), (2, T[2])])
    assert build_dedup_index(spark, base, index_dir, "s0") is True

    # drop 1: SUB_B shares the 12-word SPAN with indexed SUB_A → dropped;
    # SUB_CLEAN shares nothing → retained; a too-short doc (no span at
    # this grain) is always retained
    drop1 = _docs(spark, [(10, SUB_B), (11, SUB_CLEAN), (12, "tiny doc")])
    got = [r.doc_id for r in
           dedup_delta_substring_retained(spark, drop1, index_dir).collect()]
    assert got == [11, 12]

    docs1 = drop1.join(
        dedup_delta_substring_retained(spark, drop1, index_dir),
        "doc_id", "semi",
    )
    before = _data_files(index_dir)
    assert update_dedup_index(spark, docs1, index_dir, "s1") is True
    after = _data_files(index_dir)
    # O(delta) holds for the substring table too: nothing rewritten
    assert all(after.get(p) == meta for p, meta in before.items())

    # drop 2: a near-verbatim reuse of drop-1's retained SUB_CLEAN text —
    # only the index updated by drop 1 can catch it
    drop2 = _docs(spark, [(20, SUB_CLEAN + " extra"), (21, FRESH3)])
    got2 = [r.doc_id for r in
            dedup_delta_substring_retained(spark, drop2, index_dir).collect()]
    assert got2 == [21]


def test_dedup_substring_index_boilerplate_cap(spark, index_dir):
    """A span held by more than SUB_MAX_DF stored docs is boilerplate —
    it must NOT drop a delta doc (template repetition is not duplication
    evidence), while a genuinely shared span still does."""
    from clickhousemigrators3_spark.operators.dedup import SUB_MAX_DF
    from clickhousemigrators3_spark.operators.dedup_index import (
        dedup_delta_substring_retained,
    )

    boiler = ("standard legal disclaimer text applies to all documents "
              "in this corpus always")
    assert len(boiler.split()) == 12
    rows = [(i, f"{boiler} unique body {i} " +
             " ".join(f"tok{i}x{j}" for j in range(6)))
            for i in range(SUB_MAX_DF + 5)]
    rows.append((900, SUB_A))
    assert build_dedup_index(spark, _docs(spark, rows), index_dir, "s0")

    delta = _docs(spark, [
        (1000, f"{boiler} with its own fresh continuation words here"),
        (1001, SUB_B),  # shares the real SPAN with stored doc 900
    ])
    got = [r.doc_id for r in
           dedup_delta_substring_retained(spark, delta, index_dir).collect()]
    # 1000 survives (only boilerplate overlap); 1001 drops (real dup)
    assert got == [1000]


def test_dedup_substring_index_matches_emulated_twin(spark, index_dir):
    """The persisted drive equals the registered emulated twin
    (dedup_substring_incremental_retained) on the same old/new split of
    the sf0.001 fixture corpus."""
    from clickhousemigrators3_spark.catalog import load_table
    from clickhousemigrators3_spark.operators.dedup import (
        INC_MOD,
        dedup_substring_incremental_retained,
    )
    from clickhousemigrators3_spark.operators.dedup_index import (
        dedup_delta_substring_retained,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents")
    old = d.filter(F.col("doc_id") % INC_MOD != 0)
    new = d.filter(F.col("doc_id") % INC_MOD == 0)
    assert build_dedup_index(spark, old, index_dir, "s0") is True

    stored = [r.doc_id for r in
              dedup_delta_substring_retained(spark, new, index_dir).collect()]
    twin = [r.doc_id for r in
            dedup_substring_incremental_retained(spark, sf).collect()]
    assert stored == twin and len(twin) > 0


def test_stream_dedup_ingest_substring_gate(spark, index_dir, tmp_path):
    """The streaming twin with substring_gate=True: a drop-2 doc that is
    NOT a minhash near-dup of anything but verbatim-reuses a 12-word span
    from a doc RETAINED in drop 1 is caught — only possible because drop
    1's survivors' span fingerprints were merged into the stored index
    between batches."""
    import time as _time

    from clickhousemigrators3_spark.streaming.ingest import stream_dedup_ingest

    base = _docs(spark, [(0, T[0]), (1, T[1])])
    assert build_dedup_index(spark, base, index_dir, "s0") is True

    src = str(tmp_path / "drops")
    _docs(spark, [(10, SUB_A), (11, FRESH2)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _time.sleep(1.1)
    # 20 shares the SPAN with drop-1's retained SUB_A but differs enough
    # everywhere else that minhash LSH alone would keep it
    _docs(spark, [(20, SUB_B), (21, FRESH3)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out = str(tmp_path / "retained")
    ckpt = str(tmp_path / "ckpt")
    stream_dedup_ingest(spark, src, index_dir, out, ckpt,
                        substring_gate=True)
    got = sorted(
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert got == [10, 11, 21]  # 20 dropped by the substring gate


def test_compact_crash_mid_sequence_converges(spark, index_dir, monkeypatch):
    """compact_dedup_index flips manifests per table as each compacted
    prefix lands; a crash mid-sequence leaves the remaining tables on
    their (still-correct) chains, and a retry with the SAME id converges
    — already-compacted tables skip, the rest compact."""
    import clickhousemigrators3_spark.operators.dedup_index as di

    base = _docs(spark, [(i, T[i]) for i in range(3)])
    assert build_dedup_index(spark, base, index_dir, "s0") is True
    d = _docs(spark, [(10, FRESH1)])
    r = dedup_delta_retained(spark, d, index_dir)
    assert update_dedup_index(
        spark, d.join(r, "doc_id", "semi"), index_dir, "s1"
    ) is True
    c_before = _counts(spark, index_dir)

    real_publish = di.publish_manifest
    calls = {"n": 0}

    def crashing_publish(dest_dir, table, data_path):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated crash mid-compact")
        return real_publish(dest_dir, table, data_path)

    monkeypatch.setattr(di, "publish_manifest", crashing_publish)
    with pytest.raises(OSError, match="mid-compact"):
        di.compact_dedup_index(spark, index_dir, "c0")
    monkeypatch.setattr(di, "publish_manifest", real_publish)

    # mid-crash state still reads correctly (mixed chains + compacted)
    assert _counts(spark, index_dir) == c_before
    # retry converges every table to the single compacted prefix
    assert di.compact_dedup_index(spark, index_dir, "c0") is True
    assert all(
        len(di._live_paths(index_dir, t)) == 1 for t in INDEX_TABLES
    )
    assert _counts(spark, index_dir) == c_before
    # replay is a no-op
    assert di.compact_dedup_index(spark, index_dir, "c0") is False


def test_auto_compact_knob_folds_long_chain(spark, index_dir):
    """update_dedup_index(auto_compact_after=K): the chain-length POLICY
    the round-10 verdict asked for — routine updates stay O(delta) until
    the live list exceeds K prefixes, then the update itself triggers the
    existing crash-safe compaction (deterministic ``<snapshot>.auto`` id).
    Counts and retained-query results are unchanged across the fold, and
    the next update appends to the compacted chain normally."""
    from clickhousemigrators3_spark.operators.dedup_index import _live_paths

    base = _docs(spark, [(i, T[i]) for i in range(5)])
    assert build_dedup_index(spark, base, index_dir, "s0") is True
    # grow the chain to 3 prefixes with knobless updates (policy stays
    # explicit when the knob is absent)
    for snap, doc in (("s1", (10, FRESH1)), ("s2", (11, FRESH2))):
        d = _docs(spark, [doc])
        r = dedup_delta_retained(spark, d, index_dir)
        assert update_dedup_index(
            spark, d.join(r, "doc_id", "semi"), index_dir, snap
        ) is True
    assert all(len(_live_paths(index_dir, t)) == 3 for t in INDEX_TABLES)
    c_before = _counts(spark, index_dir)
    assert c_before["dedup_fp"] == 7
    d3 = _docs(spark, [(12, FRESH3)])
    r3 = dedup_delta_retained(spark, d3, index_dir)
    assert update_dedup_index(
        spark, d3.join(r3, "doc_id", "semi"), index_dir, "s3",
        auto_compact_after=2,
    ) is True
    # the append took the chain to 4 > 2 → auto-folded to one prefix
    assert all(
        _live_paths(index_dir, t)
        == [f"{index_dir}/{t}__s3.auto.compact"]
        for t in INDEX_TABLES
    )
    c_after = _counts(spark, index_dir)
    assert c_after["dedup_fp"] == 8
    # the folded index still answers: exact dup of every prior retained
    # doc drops, fresh text survives
    probe = _docs(spark, [(20, FRESH1), (21, FRESH3), (22, T[0]),
                          (23, "wholly new words about glaciers moraines "
                               "crevasses seracs icefalls cirques aretes")])
    got = sorted(
        r.doc_id
        for r in dedup_delta_retained(spark, probe, index_dir).collect()
    )
    assert got == [23]
    # next update appends to the compacted chain (length 2 <= K: no fold)
    d4 = _docs(spark, [(30, "fresh follow-up sentences describing looms "
                            "shuttles warps wefts heddles treadles reeds")])
    r4 = dedup_delta_retained(spark, d4, index_dir)
    assert update_dedup_index(
        spark, d4.join(r4, "doc_id", "semi"), index_dir, "s4",
        auto_compact_after=2,
    ) is True
    assert all(len(_live_paths(index_dir, t)) == 2 for t in INDEX_TABLES)
    with pytest.raises(ValueError, match="auto_compact_after"):
        update_dedup_index(
            spark, d4, index_dir, "s5", auto_compact_after=0
        )


def test_auto_compact_crash_converges_on_update_replay(
    spark, index_dir, monkeypatch
):
    """Crash INSIDE the auto-compaction, then replay the WHOLE update call
    (the orchestrator's retry unit): the append phase must NOT duplicate
    the delta — after a partial fold, some tables' live lists no longer
    contain the snapshot prefix (its rows are inside the compacted prefix),
    so replay detection consults the manifest's version HISTORY — and the
    deterministic ``<snapshot>.auto`` compaction id lets the retried fold
    converge table by table."""
    import clickhousemigrators3_spark.operators.dedup_index as di

    base = _docs(spark, [(i, T[i]) for i in range(4)])
    assert build_dedup_index(spark, base, index_dir, "s0") is True
    d1 = _docs(spark, [(10, FRESH1)])
    r1 = dedup_delta_retained(spark, d1, index_dir)
    docs1 = d1.join(r1, "doc_id", "semi")
    assert update_dedup_index(spark, docs1, index_dir, "s1") is True

    d2 = _docs(spark, [(11, FRESH2)])
    r2 = dedup_delta_retained(spark, d2, index_dir)
    docs2 = d2.join(r2, "doc_id", "semi")

    real_publish = di.publish_manifest
    calls = {"n": 0}

    def crashing_publish(dest_dir, table, data_path):
        calls["n"] += 1
        # the s2 append flips 4 manifests (calls 1-4); crash on the SECOND
        # compaction flip (call 6): one table compacted, three on chains
        if calls["n"] == 6:
            raise OSError("simulated crash mid-auto-compact")
        return real_publish(dest_dir, table, data_path)

    monkeypatch.setattr(di, "publish_manifest", crashing_publish)
    with pytest.raises(OSError, match="mid-auto-compact"):
        di.update_dedup_index(
            spark, docs2, index_dir, "s2", auto_compact_after=1
        )
    monkeypatch.setattr(di, "publish_manifest", real_publish)

    # mid-crash: mixed state (>=1 table folded, others on 3-prefix chains)
    folded = [
        t for t in INDEX_TABLES if len(di._live_paths(index_dir, t)) == 1
    ]
    assert folded and len(folded) < len(INDEX_TABLES)
    c_mid = _counts(spark, index_dir)
    assert c_mid["dedup_fp"] == 6  # 4 base + FRESH1 + FRESH2, no dups

    # replay of the SAME update call: appends all skip (history-aware),
    # the fold completes, and no row is duplicated anywhere
    assert di.update_dedup_index(
        spark, docs2, index_dir, "s2", auto_compact_after=1
    ) is True
    assert all(
        di._live_paths(index_dir, t) == [f"{index_dir}/{t}__s2.auto.compact"]
        for t in INDEX_TABLES
    )
    assert _counts(spark, index_dir) == c_mid
    # a second replay is a full no-op
    assert di.update_dedup_index(
        spark, docs2, index_dir, "s2", auto_compact_after=1
    ) is False


def test_stream_dedup_ingest_bloom_gate(spark, index_dir, tmp_path):
    """The streaming twin with a PUBLISHED decontamination Bloom filter:
    a drop doc that verbatim-reuses benchmark text is dropped at ingest —
    without the benchmark text ever shipping to the pipeline (only the
    one-way (word, bits) artifact does) — while fresh docs pass and enter
    the dedup index as usual."""
    from clickhousemigrators3_spark.operators.traindata import (
        publish_decontamination_bloom,
    )
    from clickhousemigrators3_spark.streaming.ingest import stream_dedup_ingest

    base = _docs(spark, [(0, T[0])])
    assert build_dedup_index(spark, base, index_dir, "s0") is True

    bench_dir = str(tmp_path / "bloom")
    publish_decontamination_bloom(_docs(spark, [(900, FRESH2)]), bench_dir)
    # the artifact is the constant-size (word, bits) table plus its own
    # (m, k) sizing stamp (round 12) — never benchmark text
    bloom = spark.read.parquet(bench_dir)
    assert set(bloom.columns) == {"word", "bits", "_m", "_k"}
    assert bloom.count() <= 65536 // 32

    src = str(tmp_path / "drops")
    _docs(spark, [(10, FRESH2), (11, FRESH1)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out = str(tmp_path / "retained")
    ckpt = str(tmp_path / "ckpt")
    stream_dedup_ingest(spark, src, index_dir, out, ckpt,
                        decontam_bloom_dir=bench_dir)
    got = sorted(
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert got == [11]  # 10 is benchmark-contaminated, gated at ingest
    # the contaminated doc's fingerprints never entered the index either
    c = _counts(spark, index_dir)
    assert c["dedup_fp"] == 2  # base doc 0 + retained doc 11 only
