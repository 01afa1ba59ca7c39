#!/usr/bin/env python
"""Synthesize a LARGER benchmark fixture by deterministic replication
of sf0.1 — the scaling-measurement fixture the r13 verdict asked for
(item 5): at sf0.1 every headline query is sub-2 s and per-job
scheduling floors dominate, so 32-vs-8-core ratios sit near 1 and the
driver's scaling probe cannot see parallel speedup. A 10x fixture
("sf1", ~6M lineitem / 1.5M orders / 1M events / 50k docs) makes
compute the dominant term so the core-count curve means something.

NOT an oracle fixture: replication preserves per-key distributions but
is not the driver's generator — never point correctness tests at it,
only bench.py (which computes, and never compares).

Replication scheme (R copies, replica r = 0 is the original):
- dimension tables nation/region copy unchanged (the 25-nation corridor
  grid is a schema constant);
- part/supplier/customer/orders/lineitem/events/embeddings replicate
  with per-table key offsets (key + r * OFFSET), foreign keys shifted
  consistently so per-entity degree distributions are EXACTLY the
  original's (replica r's lineitems reference replica r's parts);
- document text gets a replica marker token spliced in every 4 tokens
  for r > 0: cross-replica shingle/gram overlap drops to zero (the
  dedup/LSH workload keeps its per-corpus pair structure instead of
  gaining 45x artificial exact-duplicate pairs), while within-replica
  near-dup pairs keep matching (both sides receive the same markers);
- embeddings perturb coordinate 0 by r * 1e-3 so ANN top-k does not
  degenerate to 10 exact copies per neighbor.

Usage: python tools/gen_scale_fixture.py [R] [OUT_DIR]
       (defaults: R=10, OUT_DIR=/root/scale_fixture/sf1)
"""
from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")

#: Key offsets per replica — far above every sf0.1 key range (max key
#: ~6e5) and small enough that downstream id arithmetic (id * 1e6
#: style screens) stays in int64.
OFF = 10_000_000


def _shift(t: pa.Table, cols: dict[str, int], r: int) -> pa.Table:
    for c, off in cols.items():
        idx = t.schema.get_field_index(c)
        shifted = pc.add(t.column(c), pa.scalar(r * off, type=t.schema.field(c).type))
        t = t.set_column(idx, t.schema.field(c), shifted)
    return t


def _mark_text(texts: list[str], r: int) -> list[str]:
    out = []
    for s in texts:
        toks = s.split(" ")
        marked: list[str] = []
        for i, tok in enumerate(toks):
            if i and i % 4 == 0:
                marked.append(f"zz{r}q{i % 64}")
            marked.append(tok)
        out.append(" ".join(marked))
    return out


def main() -> None:
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/scale_fixture/sf1"
    os.makedirs(out_dir, exist_ok=True)

    for t in ("nation", "region"):
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{out_dir}/{t}.parquet")
        print(f"{t}: copied")

    plain_shift = {
        "part": {"p_partkey": OFF},
        "supplier": {"s_suppkey": OFF},
        "orders": {"o_orderkey": OFF, "o_custkey": OFF},
        "lineitem": {"l_orderkey": OFF, "l_partkey": OFF, "l_suppkey": OFF},
        "events": {"event_id": OFF, "user_id": OFF},
    }
    for t, cols in plain_shift.items():
        src = pq.read_table(f"{SRC}/{t}.parquet")
        reps = [_shift(src, cols, r) for r in range(n_rep)]
        out = pa.concat_tables(reps)
        pq.write_table(out, f"{out_dir}/{t}.parquet")
        print(f"{t}: {src.num_rows} -> {out.num_rows}")

    # customer: shift key AND regenerate the name from the shifted key
    # (names are key-derived in the source fixture; duplicating them
    # verbatim would give every name 10 edit-distance-0 twins).
    src = pq.read_table(f"{SRC}/customer.parquet")
    reps = []
    for r in range(n_rep):
        t = _shift(src, {"c_custkey": OFF}, r)
        names = [f"Customer#{k:09d}" for k in t.column("c_custkey").to_pylist()]
        t = t.set_column(
            t.schema.get_field_index("c_name"), "c_name", pa.array(names, pa.string())
        )
        reps.append(t)
    out = pa.concat_tables(reps)
    pq.write_table(out, f"{out_dir}/customer.parquet")
    print(f"customer: {src.num_rows} -> {out.num_rows}")

    src = pq.read_table(f"{SRC}/documents.parquet")
    reps = [src]
    for r in range(1, n_rep):
        t = _shift(src, {"doc_id": OFF}, r)
        texts = _mark_text(t.column("text").to_pylist(), r)
        t = t.set_column(
            t.schema.get_field_index("text"), "text", pa.array(texts, pa.string())
        )
        t = t.set_column(
            t.schema.get_field_index("n_chars"),
            "n_chars",
            pa.array([len(s) for s in texts], pa.int64()),
        )
        reps.append(t)
    out = pa.concat_tables(reps)
    pq.write_table(out, f"{out_dir}/documents.parquet")
    print(f"documents: {src.num_rows} -> {out.num_rows}")

    src = pq.read_table(f"{SRC}/embeddings.parquet")
    reps = [src]
    for r in range(1, n_rep):
        t = _shift(src, {"vec_id": OFF}, r)
        vecs = t.column("embedding").to_pylist()
        for v in vecs:
            v[0] = v[0] + r * 1e-3
        t = t.set_column(
            t.schema.get_field_index("embedding"),
            "embedding",
            pa.array(vecs, pa.list_(pa.float32())),
        )
        reps.append(t)
    out = pa.concat_tables(reps)
    pq.write_table(out, f"{out_dir}/embeddings.parquet")
    print(f"embeddings: {src.num_rows} -> {out.num_rows}")
    print(f"fixture written to {out_dir}")


if __name__ == "__main__":
    main()
