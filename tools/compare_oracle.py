#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Reads /tmp/verify_out/<name>/ parquet (Spark result) and oracle_sql.json,
runs each oracle SQL in DuckDB with tables registered from the sf dir,
and compares rows / schema / values (columns sorted by name, rows sorted).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
overall = True
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"[{name}] MISSING spark result")
        overall = False
        continue
    sdf = pd.concat([pd.read_parquet(p) for p in spark_files], ignore_index=True)
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"[{name}] ORACLE SQL ERROR: {e}")
        overall = False
        continue
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    rows = len(sdf) == len(odf)
    cols = list(sdf.columns) == list(odf.columns)
    dtypes_s = [str(t) for t in sdf.dtypes]
    dtypes_o = [str(t) for t in odf.dtypes]
    schema = cols and dtypes_s == dtypes_o
    values = False
    if rows and cols:
        s2 = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
        o2 = odf.sort_values(by=list(odf.columns)).reset_index(drop=True)
        try:
            values = s2.equals(o2.astype(s2.dtypes.to_dict()))
        except Exception:
            values = False
        if not values:
            # show first mismatch
            for c in sdf.columns:
                if not s2[c].equals(o2[c].astype(s2[c].dtype)):
                    bad = (s2[c] != o2[c].astype(s2[c].dtype))
                    i = bad.idxmax()
                    print(f"    first mismatch col={c} row={i}: spark={s2[c][i]!r} oracle={o2[c][i]!r}")
                    break
    ok = rows and schema and values
    overall = overall and ok
    status = "OK " if ok else "FAIL"
    print(f"[{name}] {status} rows={rows}({len(sdf)}/{len(odf)}) schema={schema} values={values}")
    if not schema:
        print(f"    spark cols: {list(sdf.columns)} {dtypes_s}")
        print(f"    oracle cols: {list(odf.columns)} {dtypes_o}")
print("ALL OK" if overall else "FAILURES PRESENT")
sys.exit(0 if overall else 1)
