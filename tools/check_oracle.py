#!/usr/bin/env python3
"""Local stand-in for the round driver's correctness check: run
graft.Verify first (writes <out>/<name>/ parquet + oracle_sql.json),
then this script replays each oracle SQL in DuckDB over the same
testdata dir and compares values (columns sorted by name, rows sorted).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(repr(x) for x in t))
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(sqls.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark parquet output")
            n_fail += 1
            continue
        s_rows = []
        s_cols = None
        for f in sorted(files):
            tbl = pq.read_table(f)
            s_cols = tbl.column_names
            s_rows.extend(tuple(row[c] for c in s_cols) for row in tbl.to_pylist())
        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"SQLERR   {name}: {e}")
            n_fail += 1
            continue
        sc, sr = norm(s_rows, list(s_cols))
        dc, dr = norm(d_rows, d_cols)
        if sc != dc:
            print(f"COLFAIL  {name}: spark={sc} duck={dc}")
            n_fail += 1
        elif sr != dr:
            n_fail += 1
            print(f"ROWFAIL  {name}: spark={len(sr)} duck={len(dr)} rows")
            diffs = 0
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b:
                    print(f"  row {i}: spark={a} duck={b}")
                    diffs += 1
                    if diffs >= 5:
                        break
            if len(sr) != len(dr):
                only_s = set(sr) - set(dr)
                only_d = set(dr) - set(sr)
                for x in list(only_s)[:3]:
                    print(f"  only-spark: {x}")
                for x in list(only_d)[:3]:
                    print(f"  only-duck:  {x}")
        else:
            n_pass += 1
            print(f"PASS     {name} ({len(sr)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
