#!/usr/bin/env python3
"""Deterministic scale-step generator: COPIES x sf0.1 (10 -> sf1, 100 -> sf10).

Replicates every scaling table 10x with disjoint id spaces per copy
(new_id = old_id + r * N_table), preserving the corpora's pair
structure WITHIN each copy and keeping copies disjoint:

- documents: copy r=0 is the original corpus verbatim; copies r>0
  suffix every whitespace token with '~r', so trigram/shingle/vocab
  structure is identical per copy but shares NOTHING across copies —
  dedup/containment/span workloads scale exactly 10x instead of
  exploding quadratically on cross-copy exact clones. n_chars is
  recomputed from the rewritten text. The PII queries are unaffected:
  both the Spark side and the oracle SYNTHESIZE pii spans from doc_id,
  not from stored text.
- embeddings: copy r=0 verbatim; copies r>0 apply a seeded signed
  permutation of the 64 dims (v' = sign ⊙ v[perm]) — unit norms and
  within-copy pair structure are preserved exactly (the per-copy
  corpora are isometric), while cross-copy cosines fall back to the
  random background. labels ride along unchanged.
- TPC-H tables: every foreign key is offset with the SAME per-table
  stride (orderkey/custkey/partkey/suppkey), so each copy is a
  referentially-intact replica; region/nation stay fixed (dimension
  enumerations, as in TPC-H itself). Key-derived name strings
  (Customer#/Supplier#) are re-printed from the new key.
- events: written via pyarrow with the ORIGINAL physical types — ts
  keeps the SOURCE physical type byte-for-byte (no pyarrow
  round-trip coercion changing the code path Tables.events exercises).

Offsets are chosen so the library's id-derived conventions replicate
per copy: N_doc=5000 ≡ 0 (mod 10, 1000) keeps the q73 batch split and
sampling permilles aligned; N_vec=2000 ≡ 0 (mod 50) keeps the
standard probe set (vec_id % 50 == 0) hitting the same per-copy rows.

Each table lands as a DIRECTORY <out>/<t>.parquet/ of COPIES part
files (one per copy), so Spark scans the output with native splits.

Usage: python3 tools/gen_sf1.py [src=/root/testdata/sf0.1] [out=testdata/sf1] [copies=10]
"""
import os, shutil, sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata/sf1")
# replication factor (argv[3]): 10 -> sf1; 100 -> sf10 (the 100x step).
# Every id-derived convention survives any COPIES because the strides
# are multiples of the library's modulus conventions (vec_id % 50,
# doc_id % 10, user_id % 10).
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

N = dict(customer=15000, supplier=1000, part=20000, orders=150000,
         lineitem=600000, events=100000, documents=5000, embeddings=2000,
         user=1500)


def offset(tbl, col, stride, r):
    i = tbl.schema.get_field_index(col)
    newc = pc.add(tbl.column(col), pa.scalar(stride * r, tbl.schema.field(col).type))
    return tbl.set_column(i, tbl.schema.field(col), newc)


def reprint_name(tbl, col, prefix, keycol):
    keys = tbl.column(keycol).to_pylist()
    names = pa.array([f"{prefix}#{k:09d}" for k in keys], pa.string())
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(i, tbl.schema.field(col), names)


def write_copies(name, transform):
    src = pq.read_table(f"{SRC}/{name}.parquet")
    d = f"{OUT}/{name}.parquet"
    os.makedirs(d, exist_ok=True)
    for r in range(COPIES):
        out = transform(src, r)
        assert out.schema.equals(src.schema), f"{name}: schema drift at copy {r}"
        pq.write_table(out, f"{d}/part-{r:03d}.parquet", version="2.6",
                       coerce_timestamps=None)
    print(f"{name}: {src.num_rows} x {COPIES} rows -> {d}")


def main():
    os.makedirs(OUT, exist_ok=True)
    # fixed dimension enumerations: byte-identical copies
    for t in ["region", "nation"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
        print(f"{t}: copied verbatim")

    write_copies("customer", lambda t, r: reprint_name(
        offset(t, "c_custkey", N["customer"], r), "c_name", "Customer", "c_custkey"))
    write_copies("supplier", lambda t, r: reprint_name(
        offset(t, "s_suppkey", N["supplier"], r), "s_name", "Supplier", "s_suppkey"))
    write_copies("part", lambda t, r: offset(t, "p_partkey", N["part"], r))
    write_copies("orders", lambda t, r: offset(
        offset(t, "o_orderkey", N["orders"], r), "o_custkey", N["customer"], r))
    write_copies("lineitem", lambda t, r: offset(offset(offset(
        t, "l_orderkey", N["orders"], r),
        "l_partkey", N["part"], r), "l_suppkey", N["supplier"], r))
    write_copies("events", lambda t, r: offset(
        offset(t, "event_id", N["events"], r), "user_id", N["user"], r))

    def doc_transform(t, r):
        t = offset(t, "doc_id", N["documents"], r)
        if r == 0:
            return t
        texts = t.column("text").to_pylist()
        suffixed = [" ".join(w + f"~{r}" for w in s.split(" ")) for s in texts]
        t = t.set_column(t.schema.get_field_index("text"),
                         t.schema.field("text"), pa.array(suffixed, pa.string()))
        nc = pa.array([len(s) for s in suffixed],
                      t.schema.field("n_chars").type)
        return t.set_column(t.schema.get_field_index("n_chars"),
                            t.schema.field("n_chars"), nc)
    write_copies("documents", doc_transform)

    def emb_transform(t, r):
        t = offset(t, "vec_id", N["embeddings"], r)
        if r == 0:
            return t
        rng = np.random.RandomState(1000 + r)
        perm = rng.permutation(64)
        sign = rng.choice(np.array([-1.0, 1.0], dtype=np.float32), 64)
        emb = t.column("embedding").to_pylist()
        mat = np.array(emb, dtype=np.float32)          # (n, 64)
        out = (mat[:, perm] * sign[None, :]).astype(np.float32)
        arr = pa.array(list(out), t.schema.field("embedding").type)
        return t.set_column(t.schema.get_field_index("embedding"),
                            t.schema.field("embedding"), arr)
    write_copies("embeddings", emb_transform)

    # fidelity: events.ts must keep the SOURCE physical type (no
    # pyarrow round-trip coercion changing the code path Tables.events
    # exercises — the driver's testdata is timestamp[us])
    src_ts = pq.read_schema(f"{SRC}/events.parquet").field("ts").type
    ts_type = pq.read_schema(
        f"{OUT}/events.parquet/part-000.parquet").field("ts").type
    assert ts_type == src_ts, f"events.ts drifted {src_ts} -> {ts_type}"
    print(f"OK: events.ts preserved as {ts_type}")

    # Completion marker, written LAST: the gate/bench scripts check this
    # file, not bare directory existence, so an interrupted generation
    # (makedirs is exist_ok and tables land one by one) can never be
    # silently benched/gated as if complete.
    with open(f"{OUT}/_GRAFT_COMPLETE", "w") as f:
        f.write(f"copies={COPIES} src={SRC}\n")
    print(f"OK: wrote {OUT}/_GRAFT_COMPLETE")


if __name__ == "__main__":
    main()
