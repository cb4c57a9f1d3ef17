#!/usr/bin/env python3
"""Diff driver-style parquet->DuckDB->hash paths across numeric
representations of the SAME values.

Inputs: the parquet dirs written by `sbt "Test/runMain graft.tools.HashProbe
/tmp/hashprobe"` — d18 (DECIMAL(18,6), parquet INT64), d30 (DECIMAL(30,6),
parquet FIXED_LEN_BYTE_ARRAY / decimal128), dbl (DOUBLE) — plus a DuckDB
"oracle" computing the same values natively at each type.

For each (spark-dump, oracle) pair it hashes the result rows several
plausible driver ways and reports which representations survive which
path. Findings live in tools/HASH_NOTES.md.
"""
import sys, glob, hashlib
import duckdb

BASE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hashprobe"

def _vals(ty):
    rows = ", ".join(
        f"(CAST({i} AS BIGINT), CAST('{v}' AS {ty}))"
        for i, v in ((1, "0.940008"), (2, "0.470004"), (3, "1.410012")))
    return f"SELECT * FROM (VALUES {rows}) t(id, w) ORDER BY id"

ORACLES = {
    "d18": _vals("DECIMAL(18,6)"),
    "d30": _vals("DECIMAL(30,6)"),
    "dbl": _vals("DOUBLE"),
}

def h(x):
    return hashlib.sha256(repr(x).encode()).hexdigest()[:12]

def paths(con, rel_sql):
    """Hash the same result several plausible driver ways."""
    out = {}
    # 1. python objects via fetchall (decimal.Decimal vs float vs int)
    out["fetchall_repr"] = h(con.execute(rel_sql).fetchall())
    # 2. pandas frame string dump (dtype-sensitive: object vs float64)
    df = con.execute(rel_sql).df()
    out["pandas_csv"] = h(df.to_csv(index=False))
    out["pandas_dtypes"] = h(str(list(df.dtypes)))
    # 3. arrow schema + column buffers (physical-representation-sensitive)
    tbl = con.execute(rel_sql).arrow()
    out["arrow_schema"] = h(str(tbl.schema))
    out["arrow_pylist"] = h(tbl.to_pylist())
    # 4. duckdb-internal: hash of the row set computed IN duckdb
    out["duckdb_hash"] = h(con.execute(
        f"SELECT md5(string_agg(CAST(w AS VARCHAR), ',' ORDER BY id)) "
        f"FROM ({rel_sql})").fetchone()[0])
    return out

def main():
    con = duckdb.connect()
    report = {}
    for name in ("d18", "d30", "dbl"):
        f = glob.glob(f"{BASE}/{name}/*.parquet")[0]
        spark_side = paths(con, f"SELECT id, w FROM read_parquet('{f}') ORDER BY id")
        oracle_side = paths(con, ORACLES[name])
        report[name] = (spark_side, oracle_side)
        print(f"== {name}: spark-parquet vs duckdb-native ==")
        for k in spark_side:
            tag = "SAME" if spark_side[k] == oracle_side[k] else "DIFF"
            print(f"  [{tag}] {k:14s} {spark_side[k]} vs {oracle_side[k]}")
    print("\n== cross-representation (same values, different types) ==")
    for k in report["d18"][0]:
        vals = {n: report[n][0][k] for n in report}
        collapsed = len(set(vals.values()))
        print(f"  {k:14s} distinct-across-types={collapsed} {vals}")

if __name__ == "__main__":
    main()
