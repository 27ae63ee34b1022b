#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB correctness gate.

NOT part of the shipped library (the engine is pure Scala/Spark). Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys

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
    fails = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"{name}: ERROR {e}")
            fails += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        schema_ok = list(got.columns) == list(exp.columns)
        ok = schema_ok and got.shape == exp.shape and got.equals(exp)
        # The driver hashes stringified values, so int64 5 vs float64 5.0
        # is a FAIL there; only same-kind dtype widths are tolerated.
        def kind_ok(c):
            kg, ke = got[c].dtype.kind, exp[c].dtype.kind
            return kg == ke or {kg, ke} <= {"i", "u"}
        if not ok and schema_ok and got.shape == exp.shape:
            # width-tolerant value compare (int32 vs int64 etc.)
            try:
                ok = all(
                    kind_ok(c)
                    and ((got[c].astype("object").where(got[c].notna(), None)
                          == exp[c].astype("object").where(exp[c].notna(), None)).all()
                         or got[c].equals(exp[c]))
                    for c in got.columns)
            except Exception:
                ok = False
        if ok and schema_ok:
            bad_kinds = [c for c in got.columns if not kind_ok(c)]
            if bad_kinds:
                ok = False
                print(f"  dtype-kind mismatch (driver hash would fail): "
                      + ", ".join(f"{c}: {got[c].dtype} vs {exp[c].dtype}"
                                  for c in bad_kinds))
        print(f"{name}: {'OK' if ok else 'FAIL'} got={got.shape} exp={exp.shape}")
        if not ok:
            fails += 1
            if not schema_ok:
                print(f"  cols got={list(got.columns)} exp={list(exp.columns)}")
            elif got.shape == exp.shape:
                neq = (got != exp) & ~(got.isna() & exp.isna())
                bad = neq.any(axis=1)
                print("  mismatched cells per col:", dict(neq.sum()[neq.sum() > 0]))
                print("  got:", got[bad].head(3).to_dict("records"))
                print("  exp:", exp[bad].head(3).to_dict("records"))
    print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
    return fails

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
