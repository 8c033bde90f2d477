#!/usr/bin/env python3
"""Independent check for p1_scan_projection at big fixtures: the driver's
hash gate sorts the full dump (60M rows at sf10) which is the only reason
p1 was excluded from the sf10 sweep. This compares the DuckDB oracle and
the Spark output as ORDER-INDEPENDENT aggregates instead — row count plus
a HUGEINT sum of DuckDB's 64-bit row hash over the same named columns —
linear, no sort, same trust model as tools/check.py (DuckDB recomputes
from source, Spark's dump is only read).

usage: indep_p1.py <sfDir> <verifyOutDir>
"""
import sys
import glob
import os
import duckdb


def rel(path):
    # fixture tables are single files in /root/testdata and directories of
    # part files in synthesized dirs — normalize to a read_parquet glob
    return path + "/*.parquet" if os.path.isdir(path) else path


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{rel(sf + '/lineitem.parquet')}')")
    oracle = ("SELECT l_orderkey AS order_key, l_linenumber AS line_no, "
              "l_extendedprice AS price FROM lineitem")
    dig = "SELECT count(*) AS n, sum(hash(order_key, line_no, price)::HUGEINT) AS h FROM ({q})"
    exp = con.execute(dig.format(q=oracle)).fetchone()
    spark_glob = glob.glob(f"{out}/p1_scan_projection/*.parquet")
    assert spark_glob, f"no spark output under {out}/p1_scan_projection"
    act = con.execute(dig.format(
        q=f"SELECT order_key, line_no, price FROM read_parquet('{out}/p1_scan_projection/*.parquet')")).fetchone()
    ok = exp == act
    print(f"{'OK  ' if ok else 'FAIL'} p1_scan_projection: oracle (n={exp[0]}, h={exp[1]}) "
          f"spark (n={act[0]}, h={act[1]})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
