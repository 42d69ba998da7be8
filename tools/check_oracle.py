#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each <sfDir>/*.parquet as a DuckDB view named by basename, runs
every SQL in <verifyOutDir>/oracle_sql.json, and compares against the
Spark-written parquet in <verifyOutDir>/<name>/ — columns sorted by name,
rows sorted, values compared exactly (floats via repr).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq


def norm(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return "b:%s" % v
    return str(v)


def table_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"[FAIL] {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {e}")
            n_fail += 1
            continue
        t = pq.read_table(spark_dir)
        scols = t.column_names
        srows = [tuple(r[c] for c in scols) for r in t.to_pylist()]
        dc, dr = table_rows(dcols, drows)
        sc, sr = table_rows(scols, srows)
        if dc != sc:
            print(f"[FAIL] {name}: columns differ duck={dc} spark={sc}")
            n_fail += 1
        elif dr != sr:
            diff = [(a, b) for a, b in zip(dr, sr) if a != b][:3]
            extra_d = [r for r in dr if r not in set(sr)][:3]
            extra_s = [r for r in sr if r not in set(dr)][:3]
            print(f"[FAIL] {name}: {len(dr)} duck vs {len(sr)} spark rows; "
                  f"first diffs={diff} duck-only={extra_d} spark-only={extra_s}")
            n_fail += 1
        else:
            print(f"[ok]   {name}: {len(dr)} rows")
            n_pass += 1
    print(f"passed {n_pass}, failed {n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
