"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB over the same parquet tables, then compares row count, schema
arity, and an order-insensitive value hash (columns sorted by name,
values stringified with float canonicalization).

Usage: python tools/parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df_pandas):
    import hashlib

    import numpy as np

    df = df_pandas.reindex(sorted(df_pandas.columns), axis=1)

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, (float, np.floating)):
            if np.isnan(v):
                return "NULL"
            return f"{float(v):.6g}"
        if isinstance(v, (np.integer,)):
            return str(int(v))
        if isinstance(v, (list, np.ndarray)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    rows = sorted("|".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return h, len(rows), list(df.columns)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as E
    from search_engine_skillbox_spark.session import get_spark

    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"OK?  {name}: rows-only check, rows={len(sdf)}")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures += 1
            continue
        sh, sn, scols = canon(sdf)
        oh, on, ocols = canon(odf)
        status = "OK  " if (sh == oh and sn == on and scols == ocols) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: spark rows={sn} hash={sh} cols={scols} | "
              f"oracle rows={on} hash={oh} cols={ocols}")
        if status == "FAIL" and sn and on:
            s2 = sdf.reindex(sorted(sdf.columns), axis=1).sort_values(list(sorted(sdf.columns))).head(5)
            o2 = odf.reindex(sorted(odf.columns), axis=1).sort_values(list(sorted(odf.columns))).head(5)
            print("  spark head:\n", s2.to_string())
            print("  oracle head:\n", o2.to_string())
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
