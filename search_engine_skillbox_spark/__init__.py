"""search_engine_skillbox_spark — a PySpark-native inverted-index build +
BM25 query engine, built from scratch with the query/data-processing
capabilities of the reference `daniil0shcharbakou/Search_Engine_Skillbox`
(Java/Spring/MySQL web search engine; see SURVEY.md).

Design: everything is declarative DataFrame/SQL so Catalyst handles
pushdown, pruning, partial aggregation, and join strategy; Python only
appears as Arrow-vectorized pandas UDFs on cold paths (HTML extraction,
posting-block codec, top-k snippets). Built for a 1000-executor cluster
reading ~10^12 docs; tested on local[32].
"""

__version__ = "0.1.0"
