#!/usr/bin/env python3
"""Synthesize an sf1-scale replica set from the driver's sf0.1 testdata for
GRAFT-SIDE scaling measurement only (SCALING.json's sf0.1 -> sf1 decade).
The driver's testdata stops at sf0.1; this replicates each table REPS times
with disjoint key spaces so per-query input grows ~10x with realistic
statistics:

 - documents: doc_id offset by k*1e6 (divisible by every modulus the
   queries split on); every word suffixed with the replica tag so the
   shingle/LSH spaces of different replicas are DISJOINT — dup mass and
   candidate-pair counts scale linearly with corpus size, as a real 10x
   crawl would, instead of every replica near-dupping replica 0 (which
   would quadratically inflate pair output and measure output growth,
   not engine scaling). n_chars recomputed for the perturbed text.
 - embeddings: vec_id offset by k*1e6; vectors jittered with a seeded
   elementwise blend (0.8*x + 0.2*U[-1,1]) so replicas are not exact
   copies piling into one cosine cluster; label kept.
 - lineitem/orders/customer/supplier/part: all surrogate keys offset by
   k*1e7 consistently, so FK joins stay valid per replica; nation/region
   keys are NOT offset (bounded dims stay bounded — q02 still groups
   into the same 25 nations).
 - events: event_id/user_id offset; payload untouched (pyarrow copy to
   preserve the TIMESTAMP(NANOS) physical type Tables.events expects).
 - nation/region: copied unchanged.

Usage: python3 tools/gen_scaled.py /root/testdata/sf0.1 /tmp/graft_sf1 10
"""
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DOC_OFF = 1_000_000
KEY_OFF = 10_000_000


def main(src, dst, reps):
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def gen(table, select_for_k):
        parts = " UNION ALL ".join(select_for_k(k) for k in range(reps))
        con.execute(
            f"COPY ({parts}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    bs = "\\"

    def doc_sel(k):
        perturbed = (
            "regexp_replace(text, '(" + bs + "S+)', '" + bs
            + f"1z{k}', 'g')")
        text = "text" if k == 0 else perturbed
        n_chars = "n_chars" if k == 0 else f"length({perturbed})"
        return (f"SELECT doc_id + {k * DOC_OFF} AS doc_id, {text} AS text, "
                f"lang, source, {n_chars} AS n_chars "
                f"FROM read_parquet('{src}/documents.parquet')")

    gen("documents", doc_sel)

    # embeddings via numpy: seeded jitter, schema preserved (list<float>)
    tbl = pq.read_table(f"{src}/embeddings.parquet")
    vec_ids = tbl.column("vec_id").to_numpy()
    embs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    labels = tbl.column("label").to_numpy()
    out_ids, out_embs, out_labels = [], [], []
    for k in range(reps):
        rng = np.random.default_rng(42 + k)
        out_ids.append(vec_ids + k * DOC_OFF)
        if k == 0:
            out_embs.append(embs)
        else:
            u = rng.uniform(-1.0, 1.0, size=embs.shape).astype(np.float32)
            out_embs.append(0.8 * embs + 0.2 * u)
        out_labels.append(labels)
    emb_list = pa.array([row for block in out_embs for row in block.tolist()],
                        type=tbl.schema.field("embedding").type)
    out = pa.table({"vec_id": pa.array(np.concatenate(out_ids),
                                       type=tbl.schema.field("vec_id").type),
                    "embedding": emb_list,
                    "label": pa.array(np.concatenate(out_labels),
                                      type=tbl.schema.field("label").type)},
                   schema=tbl.schema)
    pq.write_table(out, f"{dst}/embeddings.parquet")
    print(f"embeddings: {out.num_rows} rows")

    keyed = {
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
    }
    for table, keys in keyed.items():
        cur = con.execute(
            f"SELECT * FROM read_parquet('{src}/{table}.parquet') LIMIT 0")
        names = [d[0] for d in cur.description]

        def sel(k, table=table, names=names, keys=keys):
            exprs = ", ".join(
                f"{n} + {k * KEY_OFF} AS {n}" if n in keys else n
                for n in names)
            return (f"SELECT {exprs} FROM "
                    f"read_parquet('{src}/{table}.parquet')")
        gen(table, sel)

    # events via pyarrow: TIMESTAMP(NANOS) must survive byte-identical
    ev = pq.read_table(f"{src}/events.parquet")
    chunks = []
    for k in range(reps):
        t = ev
        for col in ("event_id", "user_id"):
            idx = t.schema.get_field_index(col)
            shifted = pa.compute.add(t.column(col), k * KEY_OFF)
            t = t.set_column(idx, t.schema.field(col), shifted)
        chunks.append(t)
    allev = pa.concat_tables(chunks)
    pq.write_table(allev, f"{dst}/events.parquet")
    print(f"events: {allev.num_rows} rows")

    for table in ("nation", "region"):
        con.execute(f"""COPY (SELECT * FROM
            read_parquet('{src}/{table}.parquet'))
            TO '{dst}/{table}.parquet' (FORMAT PARQUET)""")
        print(f"{table}: copied")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
