"""Driver-side xxhash64 must match Spark's bit-for-bit — bucket pruning
correctness depends on it."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_skillbox_spark.functions.hashing import (
    spark_xxhash64_str, term_bucket)

SAMPLES = ["", "a", "seko", "бахалулу", "x" * 100,
           "hello world this is a longer string exceeding 32 bytes!!",
           "état-écran", "混合テキスト", "\x00\x01", "word-42"]


def test_xxhash64_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    rows = df.select("s", F.xxhash64("s").alias("h"),
                     F.pmod(F.xxhash64("s"), F.lit(32)).alias("b")).collect()
    for r in rows:
        assert spark_xxhash64_str(r["s"]) == r["h"], repr(r["s"])
        assert term_bucket(r["s"], 32) == r["b"], repr(r["s"])


def test_service_e2e(spark, base_store_dir, oracle):
    """Full API response through the physical index (search_service)."""
    from search_engine_skillbox_spark.operators.index_store import IndexStore
    from search_engine_skillbox_spark.operators.service import (
        search_service, statistics_service)
    st = IndexStore(base_store_dir)  # read-only: the session base store

    by_df = sorted(oracle.df.items(), key=lambda kv: (kv[1], kv[0]))
    mid = [t for t, d in by_df if 5 <= d <= oracle.n_docs // 2]
    mid = mid[len(mid) // 2]
    rare = next(t for t, d in by_df if d == 1)

    res = search_service(spark, st, f"{mid} {rare}", limit=5)
    want = oracle.search(f"{mid} {rare}", limit=5)
    assert res["result"] is True
    assert res["count"] == want["count"]
    assert len(res["data"]) == len(want["data"])
    got_scores = sorted(round(d["relevance"], 4) for d in res["data"])
    want_scores = sorted(round(d["relevance"], 4) for d in want["data"])
    assert got_scores == want_scores
    for item in res["data"]:
        assert item["site"] == ""                    # Q7
        assert item["uri"].startswith("https://")    # T7
        assert isinstance(item["title"], str) and item["title"]
        assert len(item["snippet"]) <= 303           # T6 cap

    # VERDICT r4 #1: on a tombstone-free store the WHOLE request —
    # dictionary lookup, top-k, total count, hydrate, presentation —
    # is served driver-side: ZERO Spark jobs (the hydrate used to be
    # an unpruned corpus-wide docs/ scan)
    import time as _time
    sc = spark.sparkContext
    gid = f"svc-jobs-{_time.time_ns()}"
    sc.setJobGroup(gid, "service job count")
    res2 = search_service(spark, st, f"{mid} {rare}", limit=5)
    sc.setLocalProperty("spark.jobGroup.id", None)
    assert res2["count"] == want["count"]
    assert len(sc.statusTracker().getJobIdsForGroup(gid)) == 0

    # the distributed fallback (SPARK_GRAFT_NO_SERVING=1: Spark top-k +
    # doc_bucket-pruned broadcast-join hydrate) must produce the same
    # response as the driver-side path, field for field
    import os as _os
    _os.environ["SPARK_GRAFT_NO_SERVING"] = "1"
    try:
        res3 = search_service(spark, st, f"{mid} {rare}", limit=5)
    finally:
        del _os.environ["SPARK_GRAFT_NO_SERVING"]
    assert res3["count"] == res["count"]
    assert len(res3["data"]) == len(res["data"])
    for a, b in zip(res3["data"], res["data"]):
        for fld in ("site", "siteName", "uri", "title", "snippet"):
            assert a[fld] == b[fld], fld
        assert round(a["relevance"], 6) == round(b["relevance"], 6)

    # edge cases through the service
    assert search_service(spark, st, "  ")["result"] is False
    assert search_service(spark, st, "12345") == {
        "result": True, "count": 0, "data": []}
    assert search_service(spark, st, mid, offset=10 ** 6)["result"] is False

    stats = statistics_service(spark, st)
    assert stats["statistics"]["total"]["pages"] == 200
    assert stats["statistics"]["total"]["sites"] == 4
    assert len(stats["statistics"]["detailed"]) == 4
