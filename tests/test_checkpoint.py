"""Lineage offset-cache behavior (plans/checkpoint.py): append-only
incremental reads, concurrent-append partial-line tolerance, and the
inode guard for compact()'s directory swap. Pure python — no Spark."""

import json
import os

from search_engine_skillbox_spark.plans.checkpoint import Lineage


def _mk(tmp_path):
    return Lineage(str(tmp_path / "lineage.jsonl"))


def test_load_is_incremental_and_stable(tmp_path):
    ln = _mk(tmp_path)
    assert ln.load() == []
    t0 = ln.start("b1", "p1")
    ln.done("b1", "p1", t0, rows=5, nbytes=10)
    rows = ln.load()
    assert [r["status"] for r in rows] == ["RUNNING", "DONE"]
    # a second load with no new bytes returns equal content, and the
    # returned list is NOT the cached one (callers may mutate it)
    again = ln.load()
    assert again == rows
    again.append({"x": 1})
    assert len(ln.load()) == 2
    assert ln.done_partitions("b1") == {"p1"}


def test_partial_trailing_line_is_deferred(tmp_path):
    """A reader racing a concurrent appender (build groups append from
    threads) can see a half-flushed trailing line — load() must parse
    only complete lines and pick the row up once the newline lands."""
    ln = _mk(tmp_path)
    t0 = ln.start("b1", "p1")
    ln.done("b1", "p1", t0, rows=1, nbytes=1)
    half = json.dumps({"ts": 1, "build_id": "b1", "partition_id": "p2",
                       "status": "DONE"}) + "\n"
    with open(ln.path, "a") as f:
        f.write(half[:20])
    assert len(ln.load()) == 2  # no crash, partial line invisible
    assert ln.done_partitions("b1") == {"p1"}
    with open(ln.path, "a") as f:
        f.write(half[20:])
    assert len(ln.load()) == 3
    assert ln.done_partitions("b1") == {"p1", "p2"}


def test_inode_swap_forces_full_reread(tmp_path):
    """compact() swaps the whole store directory in by rename — the
    lineage file is then a DIFFERENT file at the same path and the
    cached offset/rows must be discarded, not appended to."""
    ln = _mk(tmp_path)
    t0 = ln.start("old", "p1")
    ln.done("old", "p1", t0, rows=1, nbytes=1)
    assert len(ln.load()) == 2
    # replace the file wholesale (new inode, fewer rows)
    swap = tmp_path / "swap.jsonl"
    with open(swap, "w") as f:
        f.write(json.dumps({"ts": 2, "build_id": "new",
                            "partition_id": "q", "status": "DONE"}) + "\n")
    os.replace(swap, ln.path)
    rows = ln.load()
    assert [r["build_id"] for r in rows] == ["new"]
    assert ln.done_partitions("new") == {"q"}
    assert ln.done_partitions("old") == set()


def test_deleted_file_clears_cache(tmp_path):
    ln = _mk(tmp_path)
    t0 = ln.start("b", "p")
    ln.done("b", "p", t0, rows=1, nbytes=1)
    assert len(ln.load()) == 2
    os.unlink(ln.path)
    assert ln.load() == []


def test_same_inode_rebuild_detected_by_head(tmp_path):
    """ADVICE r4: inode numbers can be REUSED by the filesystem after a
    delete-and-rebuild at the same path. The staleness guard therefore
    also fingerprints the file head (first-row timestamp makes distinct
    files byte-distinct) — simulate the reuse by rewriting the file
    in place (same inode, same path, same length, different bytes)."""
    ln = _mk(tmp_path)
    t0 = ln.start("old", "p1")
    ln.done("old", "p1", t0, rows=1, nbytes=1)
    assert ln.done_partitions("old") == {"p1"}
    with open(ln.path, "r") as f:
        content = f.read()
    # same length, different head → a REBUILT file the inode check alone
    # would miss; grow it past the cached offset so the splice bug would
    # have fired
    new_first = content.splitlines()[0].replace("old", "new")
    with open(ln.path, "r+") as f:  # same inode: in-place rewrite
        f.seek(0)
        f.write(new_first + "\n")
        f.truncate()
        f.write(json.dumps({"build_id": "new", "partition_id": "p2",
                            "status": "DONE", "started_at": 1.0,
                            "pad": "x" * 400}) + "\n")
    assert os.path.getsize(ln.path) > len(content)  # not a mere shrink
    rows = ln.load()
    assert {r["build_id"] for r in rows} == {"new"}
    assert ln.done_partitions("old") == set()  # no phantom DONE rows
    assert ln.done_partitions("new") == {"p2"}


def test_note_roundtrip_and_invisibility(tmp_path):
    """NOTE rows carry replay-recovery data; they must be returned by
    get_note (latest wins) and ignored by done_partitions/summary."""
    ln = _mk(tmp_path)
    assert ln.get_note("b", "oldstate") is None
    ln.note("b", "oldstate", old_dl=7, old_existed=True)
    ln.note("b", "oldstate", old_dl=9, old_existed=False)  # latest wins
    got = ln.get_note("b", "oldstate")
    assert got == {"old_dl": 9, "old_existed": False}
    assert ln.get_note("other", "oldstate") is None
    assert ln.done_partitions("b") == set()
    assert ln.summary()["status"] == "INDEXED"
