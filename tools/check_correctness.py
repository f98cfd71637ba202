#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf tables,
and compares: row count, column names (sorted), and values (rows sorted,
columns sorted by name, floats rounded to 9 significant digits).
"""
import json, math, sys

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return ("null",)
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("nan",)
            if v == 0:
                return ("f", "0")
            return ("f", f"{v:.9e}")
        if isinstance(v, int):
            return ("i", v)
        return ("s", str(v))

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name in sorted(oracles):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_cols, g_rows = [c.lower() for c in got.columns], got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: result unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(oracles[name])
            e_cols, e_rows = [c.lower() for c in exp.columns], exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(g_cols) != sorted(e_cols):
            print(f"FAIL {name}: columns {sorted(g_cols)} vs {sorted(e_cols)}")
            n_fail += 1
            continue
        if len(g_rows) != len(e_rows):
            print(f"FAIL {name}: rows {len(g_rows)} vs {len(e_rows)}")
            n_fail += 1
            continue
        cg, ce = canon(g_rows, g_cols), canon(e_rows, e_cols)
        if cg != ce:
            bad = next(i for i, (a, b) in enumerate(zip(cg, ce)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted row {bad}:")
            print(f"  got: {cg[bad]}")
            print(f"  exp: {ce[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g_rows)} rows)")
        n_pass += 1
    # queries with no oracle: rows-only smoke
    import os
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".json") or name in oracles:
            continue
        try:
            n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
            print(f"NOORACLE {name} ({n} rows)")
        except Exception as e:
            print(f"NOORACLE {name} unreadable: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
