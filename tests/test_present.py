"""T5/T6/T7 presentation rules + the Spark top-k hydrate plumbing."""

from __future__ import annotations


from search_engine_skillbox_spark.operators.present import (
    MAX_SNIPPET_LENGTH, build_result_url, build_snippet, build_title,
    hydrate_topk)


def test_title_rules():
    """Fixture table transcribed from extractTitle
    (SearchServiceImpl.java:240-251)."""
    assert build_title("", "/p") == "/p"
    assert build_title(None, "/p") == "/p"
    assert build_title("   ", "/p") == "/p"
    assert build_title("short text", "/p") == "short text"
    # exactly 120 chars → returned verbatim (not truncated)
    assert build_title("x" * 120, "/p") == "x" * 120
    # 121 unbroken chars → 120-char cut, lastSpace == -1 → NO ellipsis
    assert build_title("x" * 121, "/p") == "x" * 120
    # truncated with last space ≤ 10 chars in → raw 120-char cut, NO "..."
    s_early = "ab cd " + "x" * 130
    assert build_title(s_early, "/p") == s_early[:120]
    assert not build_title(s_early, "/p").endswith("...")
    # truncated with last space > 10 → cut at the space + "..."
    long = "word " * 40  # 200 chars, strip → 199
    t = build_title(long, "/p")
    assert t == ("word " * 40).strip()[:119] + "..."
    s = "a" * 119 + " bcdef"
    assert build_title(s, "/p") == "a" * 119 + "..."
    # leading/trailing whitespace trimmed before the cut
    assert build_title("  hi  ", "/p") == "hi"


def test_snippet_rules():
    text = " ".join(f"w{i}" for i in range(100)) + " target " + \
           " ".join(f"v{i}" for i in range(100))
    s = build_snippet(text, ["target"])
    assert "<b>target</b>" in s
    assert s.startswith("...") and s.endswith("...")
    assert len(s) <= MAX_SNIPPET_LENGTH + 3
    # no match → text[:300].trim() + "..." (SnippetService.java:46-47)
    s2 = build_snippet(text, ["absent"])
    assert s2 == text[:MAX_SNIPPET_LENGTH].strip() + "..."
    # no match, short text → the text itself, no ellipsis
    assert build_snippet("short doc", ["absent"]) == "short doc"
    # ≤ 2 segments
    s3 = build_snippet(text, ["w3", "v7", "target"])
    assert s3.count(" ... ") <= 2
    # each segment highlights ONLY its own word (SnippetService.java:39)
    both = "alpha beta " + "pad " * 60 + "alpha beta"
    sb = build_snippet(both, ["alpha", "beta"])
    first_seg = sb.split(" ... ")[0]
    assert "<b>alpha</b>" in first_seg and "<b>beta</b>" not in first_seg
    # whole-word only: "target" must not highlight inside "targetx"
    s4 = build_snippet("xx targetx yy target zz", ["target"])
    assert "<b>target</b>" in s4 and "<b>target</b>x" not in s4
    # case-insensitive highlight keeps original case
    s5 = build_snippet("aa TaRgEt bb", ["target"])
    assert "<b>TaRgEt</b>" in s5
    # Java \b is ASCII-word-class: a Cyrillic word has no boundary match
    # and is therefore never highlighted (documented reference quirk)
    s6 = build_snippet("привет мир", ["привет"])
    assert "<b>" not in s6 and "привет" in s6
    # segments are trimmed BEFORE edge markers (SnippetService.java:64):
    # the window starts exactly on a space → "...c", never "... c"
    t7 = "b" * 100 + " " + "c" * 59 + "hit tail"
    s7 = build_snippet(t7, ["hit"])
    assert s7.startswith("...c")
    # >300 cap: trim at 300 first, cut at last space past midpoint, +"..."
    w1, w2 = "q" * 30, "r" * 30
    t8 = "x" * 70 + " " + w1 + " " + "y" * 70 + " " + w2 + " " + "z" * 70
    s8 = build_snippet(t8, [w1, w2])
    # two ±60 windows around 30-char words join to > 300 chars → capped
    assert s8.endswith("...") and len(s8) <= MAX_SNIPPET_LENGTH + 3
    assert "<b>" + w1 + "</b>" in s8  # first segment's own word highlighted


def test_result_url():
    """Fixture table from buildFullUrl (SearchServiceImpl.java:209-237)."""
    assert build_result_url("https://a.test", "p") == "https://a.test/p"
    assert build_result_url("https://a.test/", "/p") == "https://a.test/p"
    assert build_result_url("https://a.test", "/p") == "https://a.test/p"
    assert build_result_url("https://a.test/", "p") == "https://a.test/p"
    assert build_result_url("https://a.test", "http://x/y") == "http://x/y"
    assert build_result_url("https://a.test", "https://x/y") == "https://x/y"
    # "httpfoo" is NOT an absolute url (Java tests http:// and https://)
    assert build_result_url("https://a.test", "httpfoo") == "https://a.test/httpfoo"
    # null path → "" → siteUrl with guaranteed trailing slash
    assert build_result_url("https://a.test", None) == "https://a.test/"
    assert build_result_url("https://a.test/", None) == "https://a.test/"
    assert build_result_url("https://a.test", "") == "https://a.test/"
    assert build_result_url("https://a.test", "   ") == "https://a.test/"
    # path is trimmed before reconciliation
    assert build_result_url("https://a.test", "  /p  ") == "https://a.test/p"


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


def test_site_name_rule(spark):
    """UrlUtils.java:43-59 byte-identity: first char uppercased, REST
    UNCHANGED (NOT str.capitalize()), "Unknown" on malformed hosts —
    the one rule, used by BOTH the column fn and the service
    presentation path (VERDICT r2 #4: no duplicated divergent copies)."""
    from pyspark.sql import functions as F

    from search_engine_skillbox_spark.functions.urlutils import (
        site_name, site_name_py)

    cases = [
        ("MySite.example.com", "MySite"),   # mixed case preserved
        ("camelCase.org", "CamelCase"),
        ("plain.test", "Plain"),
        ("", "Unknown"),                    # malformed: empty host
        (None, "Unknown"),
        (".leading-dot.test", "Unknown"),   # malformed: empty first label
    ]
    for host, want in cases:
        assert site_name_py(host) == want, host

    urls = [(f"https://{h}/x",) for h, _ in cases if h]
    got = [r["s"] for r in
           spark.createDataFrame(urls, "url string")
           .select(site_name(F.col("url")).alias("s")).collect()]
    assert got == [w for h, w in cases if h]
