"""T1/T2 invariants: per-url byte-identical extracted text; tokenizer
byte-compat between Spark (java.util.regex \\P{L}+) and the Python
oracle split."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_skillbox_spark.functions.textprep import (
    extract_text_py, tokens)
from tests.oracle import tokenize


def test_extract_text_byte_identity(spark, pages_sdf, pages_rows):
    """input_hint invariant: engine UDF output == oracle extraction, per url."""
    from search_engine_skillbox_spark.functions.textprep import with_text
    got = {r["url"]: r["text"]
           for r in with_text(pages_sdf).select("url", "text").collect()}
    assert len(got) == len(pages_rows)
    for p in pages_rows:
        assert got[p["url"]] == extract_text_py(p["html"]), p["url"]


def test_extract_rules():
    assert extract_text_py(b"<html><body><p>a  b</p></body></html>") == "a b"
    assert extract_text_py(b"<html><body><h1>a</h1><div>b</div></body></html>") == "a b"
    assert extract_text_py(b"<html><body><script>x</script>ok</body></html>") == "ok"
    assert extract_text_py(b"<html><body>a<br>b</body></html>") == "a b"
    assert extract_text_py(b"<html><body>x &amp; y &lt;z&gt;</body></html>") == "x & y <z>"
    assert extract_text_py(b"<html><head><title>t</title></head></html>") == ""
    assert extract_text_py(b"<html><body></body></html>") == ""
    assert extract_text_py(b"<html><body><b>bo</b>ld</body></html>") == "bold"
    assert extract_text_py(b"<html><body><!-- c --><p>t</p></body></html>") == "t"


TRICKY = [
    "Hello, World!",
    "Слово WORD w0rd under_score",
    "a-b c1d 12345 ... ",
    "",
    "ONLY",
    "привет-мир x",
    "tab\tand\nnewline",
]


def test_tokenizer_spark_vs_python(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(TRICKY)], "i int, s string")
    got = {r["i"]: r["t"] for r in df.select("i", tokens(F.col("s")).alias("t")).collect()}
    for i, s in enumerate(TRICKY):
        assert got[i] == tokenize(s), repr(s)


def test_zero_term_page_excluded(oracle, pages_rows):
    """doc 1 is digits-only → tokenizes empty → excluded from N (A4)."""
    url1 = pages_rows[1]["url"]
    assert url1 not in oracle.tf
    assert pages_rows[0]["url"] not in oracle.tf  # empty body
    assert oracle.n_docs == len(oracle.tf) < len(pages_rows)


def test_duplicate_fixture(oracle, pages_rows):
    """docs 2 and 3 extract to identical text (dedup fixture)."""
    t2 = extract_text_py(pages_rows[2]["html"])
    t3 = extract_text_py(pages_rows[3]["html"])
    assert t2 == t3 and len(t2) > 0
