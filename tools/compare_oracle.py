#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles, mimicking the driver's DuckDB
compare: run Verify first (writes <out>/<query>/ parquet + oracle_sql.json),
then this script re-runs each oracle in DuckDB over the same sf dir and
diffs values (columns sorted by name, rows sorted, values canonicalized).

Usage: python3 tools/compare_oracle.py /root/testdata/sf0.01 /tmp/verify_r1
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    # Decimal, int, str, datetime -> str
    s = str(v)
    return s

def frame_to_rows(names, cols):
    # columns sorted by name, then rows sorted lexicographically
    order = sorted(range(len(names)), key=lambda i: names[i])
    ncols = [cols[i] for i in order]
    rows = ["|".join(canon(c[r]) for c in ncols) for r in range(len(ncols[0]) if ncols else 0)]
    return sorted(names), sorted(rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"MISSING-OUTPUT {name}")
            n_bad += 1
            continue
        tbl = pq.read_table(files[0])
        s_names = tbl.column_names
        s_cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
        if name not in oracles:
            print(f"rows-only      {name}: {tbl.num_rows} rows")
            continue
        try:
            res = con.execute(oracles[name])
            d_names = [d[0] for d in res.description]
            d_tbl = res.fetch_arrow_table()
            d_cols = [d_tbl.column(i).to_pylist() for i in range(d_tbl.num_columns)]
        except Exception as e:
            print(f"ORACLE-ERROR   {name}: {e}")
            n_bad += 1
            continue
        sn, sr = frame_to_rows(s_names, s_cols)
        dn, dr = frame_to_rows(d_names, d_cols)
        if sn != dn:
            print(f"COL-MISMATCH   {name}: spark={sn} duckdb={dn}")
            n_bad += 1
        elif sr != dr:
            n_bad += 1
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b]
            print(f"VAL-MISMATCH   {name}: {len(sr)} vs {len(dr)} rows, {len(diffs)} differing")
            for a, b in diffs[:3]:
                print(f"    spark : {a}\n    duckdb: {b}")
            if len(sr) != len(dr):
                print(f"    spark-only: {[r for r in sr if r not in set(dr)][:2]}")
                print(f"    duck-only : {[r for r in dr if r not in set(sr)][:2]}")
        else:
            n_ok += 1
            print(f"OK             {name}: {len(sr)} rows")
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
