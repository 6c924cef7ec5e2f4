#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()``
twin on DuckDB over the same parquet, then compares row count, schema
(column names + dtypes after name-sort), and an order-insensitive value hash.
Exit 0 iff everything matches. Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: repr(v))
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    body = df.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.md5(body).hexdigest()


def main(only: list[str]) -> int:
    import __spark_entry__ as entrymod
    from docling_gfcr_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = only or sorted(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time() - t0:.1f}s]")
            if len(sdf) == 0:
                failures.append(name)
                print(f"FAIL  {name}: zero rows from rows-only query")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        a, b = canon(sdf), canon(odf)
        problems = []
        if len(a) != len(b):
            problems.append(f"rowcount {len(a)} vs {len(b)}")
        if list(a.columns) != list(b.columns):
            problems.append(f"columns {list(a.columns)} vs {list(b.columns)}")
        else:
            da, db = [str(t) for t in a.dtypes], [str(t) for t in b.dtypes]
            if da != db:
                problems.append(f"dtypes {da} vs {db}")
            if not problems and value_hash(a) != value_hash(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if neq[c].any()]
                idx = neq.any(axis=1)
                problems.append(
                    f"values differ in cols {bad_cols}; first diff:\n"
                    f"spark:  {a[idx].head(2).to_dict('records')}\n"
                    f"duckdb: {b[idx].head(2).to_dict('records')}"
                )
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(a)} rows match [{time.time() - t0:.1f}s]")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
