"""URL column functions (S4–S6) — pure built-in regexp chains, zero Python.

Reference semantics:
  S4 normalize: strip #fragment, strip leading `www.` after the scheme,
     strip one trailing `/`                 (utils/UrlUtils.java:16-34)
  S5 path: url minus `scheme://host` prefix; empty → "/"
                                            (utils/UrlUtils.java:36-41)
  S6 site name: host minus `www.`, first label, capitalized
                                            (utils/UrlUtils.java:43-60)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_url(c: Column) -> Column:
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, r"^(https?://)www\.", "$1")
    # Java strips the trailing "/" only when length > 1 (UrlUtils.java:29):
    # the bare URL "/" stays "/". Lookbehind requires a preceding char.
    return F.regexp_replace(c, r"(?<=.)/$", "")


def url_host(c: Column) -> Column:
    """Host without www. — the engine's site/partition key (replaces the
    reference's site_id FK; SURVEY §1.3)."""
    return F.regexp_replace(
        F.regexp_extract(c, r"^https?://([^/#?]+)", 1), r"^www\.", "")


def url_path(c: Column) -> Column:
    p = F.regexp_replace(c, r"^https?://[^/#?]+", "")
    p = F.regexp_replace(p, r"#.*$", "")
    return F.when(F.length(p) == 0, F.lit("/")).otherwise(p)


def site_name_py(host: str | None) -> str:
    """Driver-side twin of site_name for presentation code operating on
    an already-extracted host: first label, FIRST char uppercased, rest
    unchanged (UrlUtils.java:43-59 — NOT str.capitalize(), which also
    lowercases the tail: "MySite" must stay "MySite", not "Mysite");
    "Unknown" when the host is missing or its first label is empty."""
    if not host:
        return "Unknown"
    label = host.split(".")[0]
    if not label:
        return "Unknown"
    return label[0].upper() + label[1:]


def site_name(c: Column) -> Column:
    """First label of the host, initial-capitalized; malformed URLs (no
    parseable host → new URL() throws, or an empty first label → the
    substring(0,1) throws) fall back to "Unknown" (UrlUtils.java:43-60,
    catch at :56-59)."""
    label = F.regexp_extract(url_host(c), r"^([^.]+)", 1)
    return F.when(
        c.isNull() | (F.length(label) == 0), F.lit("Unknown")
    ).otherwise(
        F.concat(F.upper(F.substring(label, 1, 1)),
                 F.substring(label, 2, 2147483647)))
