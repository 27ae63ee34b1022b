#!/usr/bin/env python3
"""Dev-only N-x fact-table synthesizer for the iterative-graph decade
crossover (round-14 brief item 2; NOT part of the shipped library).

The graph gates (q80 pagerank, q98 bfs, q191 sssp, q91 triangles,
q238 degree-dist) derive a nation-level edge list from
lineitem⋈orders⋈customer⋈supplier and then iterate on ≤|nation|² rows.
The scale claim under test is that graft's fixed per-job overhead
amortizes once the EDGE DERIVATION (the fact scan + joins) dominates —
so this replicates lineitem+orders M times with SHIFTED order keys
(same customers, suppliers, nations: the derived graph keeps its 25
nodes and exact edge structure, every weight scaled by M) and leaves
the dimension tables untouched.

Usage: python3 tools/gen_scale_graph.py /tmp/scale_graph10 10
"""
import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main(out_dir, mult):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    (maxok,) = con.sql(
        f"SELECT MAX(o_orderkey)+1 FROM '{SRC}/orders.parquet'").fetchone()
    o_cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{SRC}/orders.parquet'").fetchall()]
    o_rest = ", ".join(c for c in o_cols if c != "o_orderkey")
    orders_parts = " UNION ALL ".join(
        f"""SELECT o_orderkey + {k * maxok} AS o_orderkey, {o_rest}
            FROM '{SRC}/orders.parquet'"""
        for k in range(mult))
    con.sql(f"COPY ({orders_parts}) TO '{out_dir}/orders.parquet' "
            "(FORMAT PARQUET)")
    li_cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{SRC}/lineitem.parquet'").fetchall()]
    rest = ", ".join(c for c in li_cols if c != "l_orderkey")
    li_parts = " UNION ALL ".join(
        f"""SELECT l_orderkey + {k * maxok} AS l_orderkey, {rest}
            FROM '{SRC}/lineitem.parquet'"""
        for k in range(mult))
    con.sql(f"COPY ({li_parts}) TO '{out_dir}/lineitem.parquet' "
            "(FORMAT PARQUET)")
    for t in ["customer", "supplier", "nation", "region", "part"]:
        src, dst = f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(src, dst)
    print(con.sql(
        f"SELECT (SELECT COUNT(*) FROM '{out_dir}/lineitem.parquet') li, "
        f"(SELECT COUNT(*) FROM '{out_dir}/orders.parquet') o").df())


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
