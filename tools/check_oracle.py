#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet,
sorts columns by name, sorts rows, and compares values.
"""
import json
import math
import os
import sys
import threading
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

# Per-oracle wall budget (seconds; 0 = unlimited). At sf1-scale the
# PAIR-MINING oracles are themselves quadratic in DuckDB (an
# unblocked all-pairs join over Zipf duplicate clusters — the exact
# cost the engine's banded/capped implementations avoid), so a large
# fixture needs a budget to keep the loop moving; a budget hit is an
# honest SKIP, never a FAIL.
ORACLE_TIMEOUT = int(os.environ.get("ORACLE_TIMEOUT", "0"))


class OracleTimeout(Exception):
    pass


def with_timeout(con, fn):
    """Run fn(); interrupt the duckdb connection if the budget runs
    out (duckdb raises InterruptException inside fn)."""
    if ORACLE_TIMEOUT <= 0:
        return fn()
    timer = threading.Timer(ORACLE_TIMEOUT, con.interrupt)
    timer.start()
    try:
        return fn()
    except duckdb.InterruptException:
        raise OracleTimeout()
    finally:
        timer.cancel()

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
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        # Large results (100k+ rows): python tuple-compare is O(hours)
        # at sf1-scale, so compare count + an order-independent
        # content fingerprint computed INSIDE duckdb for BOTH sides
        # (the spark parquet registered via read_parquet) — same
        # engine formats both sides, so the compare stays exact.
        spark_glob = f"{spark_dir}/*.parquet"
        try:
            n_sp = con.execute(
                f"SELECT count(*) FROM read_parquet('{spark_glob}')"
            ).fetchone()[0]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if n_sp > 100_000:
            try:
                sp_cols = sorted(r[0] for r in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{spark_glob}')"
                ).fetchall())
                du_cols = sorted(r[0] for r in con.execute(
                    f"DESCRIBE {sql}").fetchall())
                if sp_cols != du_cols:
                    print(f"FAIL {name}: columns spark={sp_cols} duck={du_cols}")
                    n_fail += 1
                    continue

                def fp(src_sql):
                    exprs = ", ".join(
                        f'coalesce(cast("{c}" AS VARCHAR), chr(30))'
                        for c in sp_cols)
                    return con.execute(
                        "SELECT count(*), coalesce(sum(hash("
                        f"concat_ws(chr(31), {exprs}))::HUGEINT), 0) "
                        f"FROM ({src_sql})").fetchone()
                a = fp(f"SELECT * FROM read_parquet('{spark_glob}')")
                b = with_timeout(con, lambda: fp(sql))
            except OracleTimeout:
                print(f"SKIP {name}: oracle exceeded {ORACLE_TIMEOUT}s "
                      f"at this scale (spark side: {n_sp} rows)")
                n_skip += 1
                continue
            except Exception as e:
                print(f"FAIL {name}: {e}")
                n_fail += 1
                continue
            if a != b:
                print(f"FAIL {name}: fingerprint spark={a} duck={b}")
                n_fail += 1
            else:
                print(f"PASS {name} ({a[0]} rows, fingerprinted)")
                n_pass += 1
            continue
        try:
            sp = pq.read_table(spark_dir)
            du = with_timeout(con,
                              lambda: con.execute(sql).fetch_arrow_table())
        except OracleTimeout:
            print(f"SKIP {name}: oracle exceeded {ORACLE_TIMEOUT}s "
                  f"at this scale (spark side: {n_sp} rows)")
            n_skip += 1
            continue
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
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
