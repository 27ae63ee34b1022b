#!/usr/bin/env python3
"""Dev-only 10x corpus synthesizer for the scale-proof run (NOT part of
the shipped library). Builds an N-times-sf0.1 documents table with the
SAME word distribution (sampled from the sf0.1 empirical frequencies),
the same uniform 10-100 word document lengths, and a constant planted
duplicate rate (~2% near-dups with 1-2 word edits, ~0.2% exact dups —
sf0.1 itself carries 8 exact dups in 5000 docs), so LSH candidate
growth measures the ALGORITHM, not a shifting dup rate.

Usage: python3 tools/gen_scale.py /tmp/scale10 10
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/documents.parquet"


def main(out_dir, mult):
    con = duckdb.connect()
    w = con.sql(
        r"""SELECT w, count(*) n FROM (SELECT unnest(
            regexp_split_to_array(trim(text), '\s+')) w FROM '%s')
            GROUP BY 1 ORDER BY 1""" % SRC).df()
    vocab = w["w"].to_numpy()
    probs = (w["n"] / w["n"].sum()).to_numpy()
    rng = np.random.default_rng(42)
    n_docs = 5000 * mult

    # one vectorized draw for the whole corpus, sliced per doc
    lengths = rng.integers(10, 101, size=n_docs)
    pool = rng.choice(vocab, size=int(lengths.sum()), p=probs)
    offs = np.concatenate([[0], np.cumsum(lengths)])
    texts = []
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < 0.02:  # near-dup: 1-2 word edits
            ws = texts[int(rng.integers(0, i))].split(" ")
            for _ in range(int(rng.integers(1, 3))):
                ws[int(rng.integers(0, len(ws)))] = str(
                    vocab[int(rng.integers(0, len(vocab)))])
            texts.append(" ".join(ws))
        elif i > 10 and r < 0.022:  # exact dup
            texts.append(texts[int(rng.integers(0, i))])
        else:
            texts.append(" ".join(pool[offs[i]:offs[i + 1]]))

    tbl = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n_docs, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, f"{out_dir}/documents.parquet")
    print(f"wrote {n_docs} docs to {out_dir}/documents.parquet")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10)
