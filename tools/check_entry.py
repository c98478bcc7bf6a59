"""Local mimic of the driver's correctness gate: run every ``queries()`` entry
on Spark and its ``oracle_sql()`` twin on DuckDB at sf0.01, compare row count,
column-name set, and an order-insensitive value hash (columns sorted by name,
rows sorted by all columns, floats as-is — the queries themselves round).

Usage: python tools/check_entry.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        col = d[c]
        if col.dtype == object:
            d[c] = col.map(lambda v: str(v.tolist()) if isinstance(v, np.ndarray) else str(v))
        elif str(col.dtype).startswith("float"):
            d[c] = col.astype("float64")
        elif str(col.dtype).startswith(("int", "uint", "Int")):
            d[c] = col.astype("int64")
        elif str(col.dtype) == "bool":
            d[c] = col.astype("int64")
    d = d.sort_values(cols, kind="mergesort").reset_index(drop=True)
    payload = d.to_csv(index=False, float_format="%.10g").encode()
    return len(d), cols, hashlib.sha256(payload).hexdigest()[:16]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    import __spark_entry__ as E
    from alibi_detect_spark.session import get_spark

    spark = get_spark("check-entry", parallelism=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, os_ = E.queries(), E.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: SPARK ERROR {str(e)[:300]}")
            n_fail += 1
            continue
        spark_s = time.monotonic() - t0
        if name not in os_:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{spark_s:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(os_[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: ORACLE ERROR {str(e)[:300]}")
            n_fail += 1
            continue
        (nr_s, c_s, h_s), (nr_o, c_o, h_o) = canon(sdf), canon(odf)
        if (nr_s, c_s, h_s) == (nr_o, c_o, h_o):
            print(f"PASS  {name}: {nr_s} rows hash={h_s} [{spark_s:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL  {name}: spark=({nr_s},{h_s}) oracle=({nr_o},{h_o})")
            if c_s != c_o:
                print(f"      cols spark={c_s} oracle={c_o}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
