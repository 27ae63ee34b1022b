#!/usr/bin/env python3
"""Dev-only N-x events synthesizer for the scale-proof run (NOT part of
the shipped library) — the events-table companion of gen_scale.py.

Replicates sf0.1's events M times with SHIFTED user_id / event_id per
replica (new users, same per-user session structure, same event-type
alphabet, same timestamp range), so path/cohort/percentile frames keep
their bounded alphabets while the row count scales: exactly the load
shape the q253/q255 operators claim to be bounded under.

Usage: python3 tools/gen_scale_events.py /tmp/scale_ev10 10
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1/events.parquet"


def main(out_dir, mult):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    n, u = con.sql(
        f"SELECT COUNT(*), MAX(user_id)+1 FROM '{SRC}'").fetchone()
    parts = " UNION ALL ".join(
        f"""SELECT event_id + {k * n} AS event_id, ts,
                   user_id + {k * u} AS user_id, event_type, value, props
            FROM '{SRC}'"""
        for k in range(mult))
    con.sql(f"COPY ({parts}) TO '{out_dir}/events.parquet' (FORMAT PARQUET)")
    print(con.sql(
        f"SELECT COUNT(*) n, COUNT(DISTINCT user_id) u "
        f"FROM '{out_dir}/events.parquet'").df())


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
