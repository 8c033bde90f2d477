#!/usr/bin/env python3
"""Order-independent oracle compare for queries whose OUTPUT is too large
to sort+hash row-wise (tools/check.py loads both sides into pandas): the
DuckDB oracle result and the Spark dump are reduced to (row count,
HUGEINT sum of DuckDB's 64-bit row hash over all columns) — linear, no
sort, same trust model as check.py (DuckDB recomputes from source and
never reads Spark's values except to hash them).

usage: check_agg.py <sfDir> <verifyOutDir> <query> [<query> ...]
"""
import sys
import os
import json
import duckdb


def rel(path):
    return path + "/*.parquet" if os.path.isdir(path) else path


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf, out = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:]
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{rel(p)}')")
    fails = 0
    for q in queries:
        sql = oracle[q]
        # column order must match on both sides: project the Spark dump in
        # the oracle result's own column order
        cols = [d[0] for d in con.execute(
            f"SELECT * FROM ({sql}) LIMIT 0").description]
        collist = ", ".join(f'"{c}"' for c in cols)
        dig = ("SELECT count(*) AS n, sum(hash({cl})::HUGEINT) AS h "
               "FROM ({q})")
        exp = con.execute(dig.format(cl=collist, q=sql)).fetchone()
        act = con.execute(dig.format(
            cl=collist,
            q=f"SELECT {collist} FROM read_parquet('{out}/{q}/*.parquet')")
        ).fetchone()
        ok = exp == act
        fails += 0 if ok else 1
        print(f"{'OK  ' if ok else 'FAIL'} {q}: oracle (n={exp[0]}, h={exp[1]}) "
              f"spark (n={act[0]}, h={act[1]})")
    print(f"\n{len(queries) - fails} ok, {fails} fail of {len(queries)}")
    sys.exit(0 if fails == 0 else 1)


if __name__ == "__main__":
    main()
