#!/usr/bin/env python3
"""Local dev mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<q>/ parquet (Spark result) and runs the oracle SQL
from <verifyOutDir>/oracle_sql.json in DuckDB over the sf tables; compares
row count, sorted-by-name schema, and a value hash.
"""
import sys, os, json, hashlib
import duckdb

def canon(con, rel_sql, label):
    df = con.execute(rel_sql).fetchdf()
    cols = sorted(df.columns)
    df = df[cols]
    # canonical: sort by all columns, stringify with float rounding
    df = df.sort_values(by=cols).reset_index(drop=True)
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        for v in row:
            if isinstance(v, float):
                h.update(("%.9g" % v).encode())
            else:
                h.update(str(v).encode())
        h.update(b"\n")
    return len(df), cols, h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = queries or sorted(oracle.keys())
    fails = 0
    for name in names:
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"{name}: MISSING spark output"); fails += 1; continue
        if name not in oracle:
            print(f"{name}: no oracle (rows-only)"); continue
        try:
            sn, sc, sh = canon(con, f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')", "spark")
            on, oc, oh = canon(con, oracle[name], "oracle")
            ok = (sn == on) and (sc == oc) and (sh == oh)
            status = "OK" if ok else "FAIL"
            if not ok:
                fails += 1
                print(f"{name}: {status} rows {sn}/{on} schema {sc==oc} hash {sh==oh}")
                if sc != oc:
                    print(f"  spark cols:  {sc}\n  oracle cols: {oc}")
            else:
                print(f"{name}: OK ({sn} rows)")
        except Exception as e:
            fails += 1
            print(f"{name}: ERROR {e}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
