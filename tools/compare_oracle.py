#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB over
views named after the parquet tables in <sfDir>, read the Spark result
parquet, sort columns by name, and compare row counts + values exactly.
"""
import sys, json, glob, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for q in sorted(oracle):
        spark_dir = f"{out_dir}/{q}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {q}: no spark output"); n_fail += 1; continue
        try:
            duck = con.sql(oracle[q]).df()
        except Exception as e:
            print(f"FAIL {q}: duckdb error: {e}"); n_fail += 1; continue
        try:
            spark = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {q}: spark read error: {e}"); n_fail += 1; continue
        sc, dc = sorted(spark.columns), sorted(duck.columns)
        if sc != dc:
            print(f"FAIL {q}: columns spark={sc} duck={dc}"); n_fail += 1; continue
        if len(spark) != len(duck):
            print(f"FAIL {q}: rows spark={len(spark)} duck={len(duck)}"); n_fail += 1; continue
        s, d = spark[sc].reset_index(drop=True), duck[dc].reset_index(drop=True)
        diffs = []
        for c in sc:
            a, b = s[c], d[c]
            try:
                neq = ~(a.eq(b) | (a.isna() & b.isna()))
            except Exception:
                neq = a.astype(str) != b.astype(str)
            if neq.any():
                i = int(neq.idxmax())
                diffs.append(f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r} ({int(neq.sum())} diffs)")
                # dtype note
                if str(a.dtype) != str(b.dtype):
                    diffs.append(f"  dtype: spark={a.dtype} duck={b.dtype}")
        if diffs:
            print(f"FAIL {q}: " + "; ".join(diffs[:4])); n_fail += 1
        else:
            # dtype check (schema match) as a warning only
            dt = [f"{c}: spark={s[c].dtype} duck={d[c].dtype}" for c in sc if str(s[c].dtype) != str(d[c].dtype)]
            note = f"  [dtype-note {', '.join(dt)}]" if dt else ""
            print(f"PASS {q} ({len(spark)} rows){note}"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return n_fail

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
