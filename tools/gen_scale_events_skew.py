#!/usr/bin/env python3
"""Dev-only SKEWED N-x events synthesizer (NOT part of the shipped
library) — gen_scale_events.py with a planted WHALE: after the M-x
shifted-id replication, every 10th event (by id) is reassigned to ONE
user, so that user owns ~10% of all events while everyone else keeps
the uniform per-user session structure. This is the adversarial load
for the per-user window family (sessionize / funnel / paths): a real
event log's heaviest user, not the uniform replica the plain scale
protocol tests.

Usage: python3 tools/gen_scale_events_skew.py /tmp/scale_ev100_skew 100
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1/events.parquet"
WHALE = 999999999


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
    con.sql(
        f"""COPY (
              SELECT event_id, ts,
                     CASE WHEN event_id % 10 = 0 THEN {WHALE}
                          ELSE user_id END AS user_id,
                     event_type, value, props
              FROM ({parts})
            ) TO '{out_dir}/events.parquet' (FORMAT PARQUET)""")
    print(con.sql(
        f"""SELECT COUNT(*) AS n, COUNT(DISTINCT user_id) AS u,
              SUM(CASE WHEN user_id = {WHALE} THEN 1 ELSE 0 END) AS whale_n
            FROM '{out_dir}/events.parquet'""").df())


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
