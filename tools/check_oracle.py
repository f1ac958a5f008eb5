#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet,
sorts columns by name, sorts rows, and compares values.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def rows_of(cols_sorted, table):
    cols = [table[c] for c in cols_sorted]
    out = []
    for i in range(len(cols[0]) if cols else 0):
        out.append(tuple(norm(c[i]) for c in cols))
    return sorted(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # multi-file table (a directory of part files)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sp = pq.read_table(spark_dir)
            du = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        sp_cols, du_cols = sorted(sp.column_names), sorted(du.column_names)
        if sp_cols != du_cols:
            print(f"FAIL {name}: columns spark={sp_cols} duck={du_cols}")
            n_fail += 1
            continue
        sp_d = {c: sp.column(c).to_pylist() for c in sp_cols}
        du_d = {c: du.column(c).to_pylist() for c in du_cols}
        a, b = rows_of(sp_cols, sp_d), rows_of(du_cols, du_d)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
        if diffs:
            i, x, y = diffs[0]
            print(f"FAIL {name}: {len(diffs)}/{len(a)} rows differ; first at {i}:")
            print(f"  cols : {sp_cols}")
            print(f"  spark: {x}")
            print(f"  duck : {y}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
