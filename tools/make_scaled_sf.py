"""Build a K-times scale PROXY of a driver testdata dir for measurement.

The driver generates its own large scale factors (BENCH_r05.json ran at
sf=1.0) but does not leave them behind; this tool fabricates a same-shape
dataset from sf0.1 so optimization work can be timed at driver-bench size.
It is a measurement proxy ONLY — correctness stays pinned to the real
driver dirs (sf0.001/sf0.01) via tools/check_oracle.py.

Construction: each table is replicated K times with key-domain offsets so
joins stay consistent (replica r's orders reference replica r's customers)
and group-size distributions are preserved (group COUNT scales K-times,
occupancy per group stays flat — the realistic corpus-growth axis):

- all integer keys get +r * (max_key + 1) per key domain
- region/nation are dimensions and stay as-is
- documents.text is deterministically perturbed per replica (every 7th
  word gets the replica id appended) so replicas are NOT near-duplicates
  of each other: shingle Jaccard drops to ~(6/7)^k and |len delta| > 3,
  keeping near-dup/minhash/edit-distance workloads at their natural
  per-group occupancy instead of K-times-inflated clusters
- embeddings are cyclically rotated by r so replicas of the same vector
  are not mutual cosine near-neighbors (rotation preserves norms)

Output mirrors the driver layout: one parquet file per table, single row
group (the scan-spread behavior under test depends on this).

Usage: python tools/make_scaled_sf.py [--src /root/testdata/sf0.1]
         [--dst /tmp/sfprox1.0] [--k 10]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _offset(col: pa.ChunkedArray, base: int, r: int) -> pa.Array:
    return pc.add(col, base * r)


def _key_base(table: pa.Table, name: str) -> int:
    return pc.max(table[name]).as_py() + 1


def _perturb_text(text: str, r: int) -> str:
    if r == 0:
        return text
    words = text.split(" ")
    tag = str(r)
    for i in range(0, len(words), 7):
        words[i] = words[i] + tag
    return " ".join(words)


def _rotate(vec: list, r: int) -> list:
    if r == 0 or not vec:
        return vec
    k = r % len(vec)
    return vec[k:] + vec[:k]


def scale_dir(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    tables = {}
    for fn in sorted(os.listdir(src)):
        if fn.endswith(".parquet"):
            tables[fn[: -len(".parquet")]] = pq.read_table(os.path.join(src, fn))

    bases = {
        "custkey": _key_base(tables["customer"], "c_custkey"),
        "orderkey": _key_base(tables["orders"], "o_orderkey"),
        "partkey": _key_base(tables["part"], "p_partkey"),
        "suppkey": _key_base(tables["supplier"], "s_suppkey"),
        "event_id": _key_base(tables["events"], "event_id"),
        "user_id": _key_base(tables["events"], "user_id"),
        "doc_id": _key_base(tables["documents"], "doc_id"),
        "vec_id": _key_base(tables["embeddings"], "vec_id"),
    }
    # (table, column) -> key domain
    keymap = {
        ("customer", "c_custkey"): "custkey",
        ("orders", "o_orderkey"): "orderkey",
        ("orders", "o_custkey"): "custkey",
        ("part", "p_partkey"): "partkey",
        ("supplier", "s_suppkey"): "suppkey",
        ("lineitem", "l_orderkey"): "orderkey",
        ("lineitem", "l_partkey"): "partkey",
        ("lineitem", "l_suppkey"): "suppkey",
        ("events", "event_id"): "event_id",
        ("events", "user_id"): "user_id",
        ("documents", "doc_id"): "doc_id",
        ("embeddings", "vec_id"): "vec_id",
    }

    for name, tbl in tables.items():
        if name in ("region", "nation"):
            out = tbl
        else:
            reps = []
            for r in range(k):
                cols = []
                for cn in tbl.column_names:
                    dom = keymap.get((name, cn))
                    if dom is not None:
                        cols.append(_offset(tbl[cn], bases[dom], r))
                    elif name == "documents" and cn == "text":
                        texts = [_perturb_text(t, r) for t in tbl[cn].to_pylist()]
                        cols.append(pa.array(texts, type=pa.string()))
                    elif name == "documents" and cn == "n_chars":
                        # recomputed below from the perturbed text
                        cols.append(tbl[cn])
                    elif name == "embeddings" and cn == "embedding":
                        vecs = [_rotate(v, r) for v in tbl[cn].to_pylist()]
                        cols.append(pa.array(vecs, type=tbl.schema.field(cn).type))
                    else:
                        cols.append(tbl[cn])
                rep = pa.table(dict(zip(tbl.column_names, cols)))
                if name == "documents":
                    lens = pa.array(
                        [len(t) for t in rep["text"].to_pylist()],
                        type=rep.schema.field("n_chars").type,
                    )
                    rep = rep.set_column(
                        rep.column_names.index("n_chars"), "n_chars", lens
                    )
                reps.append(rep)
            out = pa.concat_tables(reps)
        pq.write_table(
            out,
            os.path.join(dst, f"{name}.parquet"),
            row_group_size=max(out.num_rows, 1),
            compression="snappy",
        )
        print(f"{name}: {out.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sfprox1.0")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    scale_dir(args.src, args.dst, args.k)


if __name__ == "__main__":
    main()
