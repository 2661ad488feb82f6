"""Generate a replicated scale-up of an existing testdata dir for the
second slope decade (VERDICT r10 task 3): N key-shifted replicas of
sf0.1 -> a structurally-faithful sf{0.1*N} under .scaledata/ (never
/root/testdata, which is read-only driver property).

Faithfulness rules, chosen so per-query cost MODELS a genuinely larger
corpus instead of a degenerate 10x-duplicated one:

- Every key domain shifts by replica * (max_key + 1), consistently
  across referencing tables (orders.o_custkey moves with
  customer.c_custkey, lineitem with orders/part/supplier), so join
  cardinalities scale linearly and no cross-replica joins appear.
  region/nation are fixed dimensions - written once.
- documents.text gets a PER-REPLICA TOKEN BIJECTION (token -> token +
  'r<replica>' for replica > 0): within-replica n-gram/minhash/
  containment structure is preserved EXACTLY (bijective rename),
  while cross-replica shingle overlap is zero - so dedup pair volume
  grows linearly, the way a real 10x corpus behaves, not
  quadratically the way naive duplication would. doc_id shifts by
  5000 (divisible by every planted modulus in queries: 25/40/50), so
  planted class structure replicates per-replica.
- embeddings get a cyclic DIMENSION ROTATION per replica (rot r*7 mod
  dim): within-replica dot products are bit-preserved, cross-replica
  cosines decorrelate - ANN cluster structure scales instead of
  collapsing into 10-member duplicate stacks.
- events TIME-DILATE: replica r's timestamps shift by r * (span + 1s),
  so the scaled corpus is "N x more history at the same instantaneous
  traffic" - the axis a 100 TB event table actually grows along.
  (The alternative - same window, N x density - was measured first:
  it drives the minute-grain co-presence graph quadratic, kcore
  decade exponent 1.71, because users-per-minute-bucket pairs grow
  as density squared. That is a real operational regime, but its
  fix is bucket grain / pair caps, not engine scaling - documented
  in docs/SCALE.md; the slope table measures the history axis.)
  orders keep their dates (order-date predicates stay selective);
  user/event ids shift.

Usage: python tools/gen_sf_scale.py [N_REPLICAS] [SRC] [DST]
Defaults: 10 /root/testdata/sf0.1 <repo>/.scaledata/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (key column -> its own table) domains that shift together
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key column -> offset unit (max+1 of the column in the SOURCE dir)
DOMAIN_OF = {
    "c_custkey": "c_custkey",
    "o_orderkey": "o_orderkey",
    "o_custkey": "c_custkey",
    "l_orderkey": "o_orderkey",
    "l_partkey": "p_partkey",
    "l_suppkey": "s_suppkey",
    "p_partkey": "p_partkey",
    "s_suppkey": "s_suppkey",
    "event_id": "event_id",
    "user_id": "user_id",
    "doc_id": "doc_id",
    "vec_id": "vec_id",
}
FIXED = ["region", "nation"]


def _suffix_tokens(texts: list, r: int) -> list:
    suf = f"r{r}"
    return [
        " ".join(t + suf if t else t for t in s.split(" "))
        if s is not None
        else None
        for s in texts
    ]


def main() -> None:
    # --density: SKIP the events time-dilation — replicas keep the
    # SAME window, so the corpus is "N× instantaneous traffic"
    # (users-per-bucket grows ~N, bucket pair fan-out ~N²). This is
    # the regime that measured kcore decade exponent 1.71 in r11 and
    # that the per-bucket activity caps (queries/graph.py
    # _capped_active) exist to bound — the probe corpus for the r12
    # density-cap verification rows in docs/SCALE.md.
    density = "--density" in sys.argv
    argv = [a for a in sys.argv if a != "--density"]
    n_rep = int(argv[1]) if len(argv) > 1 else 10
    src = argv[2] if len(argv) > 2 else "/root/testdata/sf0.1"
    dst = (
        argv[3]
        if len(argv) > 3
        else os.path.join(REPO, ".scaledata", "sf1")
    )
    os.makedirs(dst, exist_ok=True)

    tables = {
        name: pq.read_table(os.path.join(src, f"{name}.parquet"))
        for name in list(SHIFT_COLS) + FIXED
    }
    unit: dict[str, int] = {}
    for name, t in tables.items():
        for col in SHIFT_COLS.get(name, []):
            dom = DOMAIN_OF[col]
            if dom == col:
                unit[dom] = int(pc.max(t[col]).as_py()) + 1

    for name in FIXED:
        pq.write_table(tables[name], os.path.join(dst, f"{name}.parquet"))

    for name in SHIFT_COLS:
        t = tables[name]
        reps = []
        for r in range(n_rep):
            cols = {}
            for field in t.schema:
                arr = t[field.name]
                if field.name in SHIFT_COLS[name]:
                    off = r * unit[DOMAIN_OF[field.name]]
                    arr = pc.add(arr, pa.scalar(off, type=field.type))
                if (
                    name == "events"
                    and field.name == "ts"
                    and r > 0
                    and not density
                ):
                    span_us = (
                        pc.max(t["ts"]).cast(pa.int64()).as_py()
                        - pc.min(t["ts"]).cast(pa.int64()).as_py()
                        + 1_000_000
                    )
                    arr = pc.add(
                        arr.combine_chunks().cast(pa.int64()),
                        pa.scalar(r * span_us, type=pa.int64()),
                    ).cast(field.type)
                cols[field.name] = arr
            if name == "documents" and r > 0:
                texts = _suffix_tokens(
                    t["text"].to_pylist(), r
                )
                cols["text"] = pa.array(texts, type=pa.string())
                cols["n_chars"] = pa.array(
                    [len(s) if s is not None else None for s in texts],
                    type=pa.int64(),
                )
            if name == "embeddings" and r > 0:
                emb = np.stack(
                    [np.asarray(v, dtype=np.float32) for v in
                     t["embedding"].to_pylist()]
                )
                rot = (r * 7) % emb.shape[1]
                emb = np.roll(emb, rot, axis=1)
                cols["embedding"] = pa.array(
                    [row.tolist() for row in emb],
                    type=t.schema.field("embedding").type,
                )
            reps.append(pa.table(cols, schema=t.schema))
        out = pa.concat_tables(reps)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
