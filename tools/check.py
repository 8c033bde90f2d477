#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare Verify.scala's
per-query parquet dumps against DuckDB executing SparkEntry.oracleSql on the
same sf directory. Usage: python3 tools/check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    # Spark writes a DIRECTORY of part files; the driver's fixtures are single files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
ok = bad = 0
for name, sql in sorted(oracle.items()):
    pq = os.path.join(outdir, name)
    if not os.path.isdir(pq):
        print(f"FAIL {name}: no spark output"); bad += 1; continue
    files = glob.glob(pq + "/*.parquet")
    if not files:
        print(f"FAIL {name}: no parquet files"); bad += 1; continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}"); bad += 1; continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        print(f"FAIL {name}: columns spark={sc} duck={dc}"); bad += 1; continue
    s = spark_df[sc].sort_values(by=sc, na_position='first').reset_index(drop=True)
    d = duck_df[dc].sort_values(by=dc, na_position='first').reset_index(drop=True)
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); bad += 1; continue
    schema_mismatch = [(c, str(s[c].dtype), str(d[c].dtype)) for c in sc
                       if str(s[c].dtype) != str(d[c].dtype)]
    mism = []
    for c in sc:
        a, b = s[c], d[c]
        try:
            import pandas as pd
            neq = ~((a == b) | (a.isna() & b.isna()))
        except Exception:
            neq = a.astype(str) != b.astype(str)
        n = int(neq.sum())
        if n:
            i = neq.idxmax()
            mism.append((c, n, a[i], b[i]))
    if mism:
        print(f"FAIL {name}: value mismatches {mism[:3]}"); bad += 1
    elif schema_mismatch:
        print(f"WARN {name}: dtype diff {schema_mismatch} (values match, {len(s)} rows)")
        ok += 1
    else:
        print(f"OK   {name}: {len(s)} rows"); ok += 1
print(f"\n{ok} ok, {bad} fail of {len(oracle)}")
sys.exit(1 if bad else 0)
