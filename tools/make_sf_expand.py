#!/usr/bin/env python
"""Deterministic replica-expansion of a testdata SF directory — the
local sf1 used for the 100 TB scale-proof measurements (VERDICT r7 #5).

The driver's generator is not shipped, so sf1 here is a 10x expansion
of sf0.1: replica 0 is the original; replicas 1..9 offset every
surrogate key by ``r * (max_key + 1)`` so joins stay consistent and
keys stay unique, while the distributions (per-key fan-outs, value
ranges, date ranges, label mixes) are preserved exactly. Two columns
get deterministic per-replica perturbation so *content-addressed*
operators scale honestly instead of degenerating:

- ``documents.text``: replicas permute each doc's word order with a
  RandomState seeded by (replica, doc_id). Doc length, vocabulary and
  per-word frequencies are unchanged (tokenizer/quality/lang-id see
  the same marginals), but shingle sets become distinct — a verbatim
  copy would give every doc 9 exact near-dups and blow MinHash bucket
  sizes up quadratically, which is NOT how independent data scales.
- ``embeddings.embedding``: replicas np.roll the vector by r dims
  (norms and pairwise-distance distribution preserved; identical
  vectors avoided for the same reason).

region/nation are fixed-cardinality dimensions at every SF and are
copied as-is. Usage:

    python tools/make_sf_expand.py [--factor 10] [--out /tmp/ast_sf1]

Writes one parquet per table (pyarrow, single file — matching the
driver's layout). Deterministic: same inputs -> byte-stable content
(row order is replica-major).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> columns that are surrogate keys into that key space
KEY_SPACES = {
    "c_custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "s_suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "p_partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "o_orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}

COPY_AS_IS = ("region", "nation")
EXPAND = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _permute_text(text: str, replica: int, doc_id: int) -> str:
    words = text.split(" ")
    rs = np.random.RandomState((replica * 1_000_003 + doc_id) % (2**31 - 1))
    return " ".join(words[i] for i in rs.permutation(len(words)))


def expand(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    tables = {t: pq.read_table(f"{src}/{t}.parquet") for t in COPY_AS_IS + EXPAND}
    # one offset per key space = max over every column drawing from it
    offsets = {
        ks: max(
            int(pa.compute.max(tables[t].column(c)).as_py()) + 1
            for t, c in cols
        )
        for ks, cols in KEY_SPACES.items()
    }
    col_off = {
        (t, c): offsets[ks] for ks, cols in KEY_SPACES.items() for t, c in cols
    }

    for t in COPY_AS_IS:
        pq.write_table(tables[t], f"{out}/{t}.parquet")
        print(t, tables[t].num_rows, "(copied)")

    for t in EXPAND:
        base = tables[t]
        chunks = []
        for r in range(factor):
            df = base.to_pandas()
            for c in df.columns:
                off = col_off.get((t, c))
                if off is not None:
                    df[c] = df[c] + r * off
            if r > 0 and t == "documents":
                df["text"] = [
                    _permute_text(s, r, int(d))
                    for s, d in zip(df["text"], df["doc_id"])
                ]
            if r > 0 and t == "embeddings":
                df["embedding"] = [
                    np.roll(np.asarray(v, np.float32), r).tolist()
                    for v in df["embedding"]
                ]
            chunks.append(pa.Table.from_pandas(df, schema=base.schema, preserve_index=False))
        expanded = pa.concat_tables(chunks)
        pq.write_table(expanded, f"{out}/{t}.parquet")
        print(t, expanded.num_rows)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/ast_sf1")
    ap.add_argument("--src", default=SRC)
    a = ap.parse_args()
    expand(a.src, a.out, a.factor)


if __name__ == "__main__":
    main()
