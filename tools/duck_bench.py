#!/usr/bin/env python3
"""Dev-only DuckDB side of the bench protocol (BASELINE.md): run every
oracle SQL string from a Verify dump against the same parquet tables —
one untimed warm-up pass, one timed pass — and print a JSON line in the
graft.Bench shape so the two records are directly comparable.

Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01"
    python3 tools/duck_bench.py /root/testdata/sf0.1 /tmp/verify_sf01
"""
import json, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sfdir, outdir, prefixes=()):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if prefixes:
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in prefixes)}
    names = sorted(oracle)
    for name in names:  # warm-up: OS page cache + duckdb readers
        try:
            con.sql(oracle[name]).fetchall()
        except Exception:
            pass
    queries, errors = {}, []
    for name in names:
        t0 = time.perf_counter()
        try:
            con.sql(oracle[name]).fetchall()
            queries[name] = time.perf_counter() - t0
        except Exception:
            queries[name] = -1.0
            errors.append(name)
    total = sum(v for v in queries.values() if v >= 0)
    print(json.dumps({"metric": "total", "value": total, "unit": "sec",
                      "engine": f"duckdb-{duckdb.__version__}",
                      "queries": queries, "errors": errors, "sf": sfdir}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:]))
