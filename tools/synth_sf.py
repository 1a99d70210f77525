"""Synthesize a driver-layout scale-up of the sf0.1 fixtures for TIMING
measurements only (never oracle checks): K id-shifted copies of every
table, written as ONE parquet row group each — the layout the driver's
generator produces (BENCH_r05 sf1.0: documents 50k rows/1 rg, events
1M/1 rg), which is what makes scan stages serial without `_spread`.

Join keys are shifted consistently (orderkey in orders+lineitem,
custkey in orders+customer, part/supp keys) so join cardinalities per
key match the base data. Document text for copy k>0 gets a salt token
injected every 4 words: any 5-word shingle crosses an injection point,
so cross-copy near-dup candidates collapse to ~none and the duplicate
RATE stays that of the base corpus instead of every doc gaining 9
clones (which would quadratically inflate LSH pair counts and make the
proxy pessimistic vs the driver's real sf1.0).

Usage: python tools/synth_sf.py --base /root/testdata/sf0.1 \
           --out /tmp/sf1.0_proxy --mult 10
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.parquet as pq

# table -> columns to shift by k * stride (stride = 10**ceil_log10(max+1)
# computed per KEY so the same stride is used everywhere the key appears)
SHIFT_KEYS = {
    "documents": {"doc_id": "doc"},
    "events": {"event_id": "event", "user_id": "user"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "customer": {"c_custkey": "cust"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "embeddings": {"vec_id": "vec"},
}
COPY_ASIS = ["region", "nation"]  # fixed dimensions, as in TPC-H


def _strides(base: str) -> dict:
    strides = {}
    for table, cols in SHIFT_KEYS.items():
        t = pq.read_table(os.path.join(base, f"{table}.parquet"))
        for col, key in cols.items():
            mx = pa.compute.max(t.column(col)).as_py() or 0
            s = 1
            while s <= mx:
                s *= 10
            strides[key] = max(strides.get(key, 1), s)
    return strides


def _salt_text(text: str, k: int) -> str:
    if not text:
        return text
    words = text.split(" ")
    tag = f"zq{k}x"
    out = []
    for i, w in enumerate(words):
        if i and i % 4 == 0:
            out.append(tag)
        out.append(w)
    return " ".join(out)


def _copy(table: str, t: pa.Table, k: int, strides: dict) -> pa.Table:
    if k == 0:
        return t
    cols = {}
    for name in t.column_names:
        col = t.column(name)
        key = SHIFT_KEYS.get(table, {}).get(name)
        if key:
            col = pa.compute.add(col, k * strides[key]).cast(col.type)
        cols[name] = col
    if table == "documents":
        texts = [_salt_text(x, k) for x in cols["text"].to_pylist()]
        cols["text"] = pa.array(texts, type=pa.string())
        cols["n_chars"] = pa.array([len(x) for x in texts],
                                   type=pa.int64())
    if table == "embeddings":
        # Roll components by k so copies are genuinely distinct vectors
        # (same norm, ~random cross-copy cosine). Exact clones would give
        # every vector 9 duplicates and multiply LSH pair counts ~100x —
        # a workload the real generator does not produce.
        vecs = [v[k % len(v):] + v[:k % len(v)] if v else v
                for v in cols["embedding"].to_pylist()]
        cols["embedding"] = pa.array(vecs, type=cols["embedding"].type)
    return pa.table(cols)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    strides = _strides(args.base)
    print("strides:", strides)
    for table in list(SHIFT_KEYS) + COPY_ASIS:
        src = os.path.join(args.base, f"{table}.parquet")
        t = pq.read_table(src)
        if table in COPY_ASIS:
            big = t  # fixed dimensions keep their base cardinality
        else:
            parts = [_copy(table, t, k, strides) for k in range(args.mult)]
            big = pa.concat_tables(parts).combine_chunks()
        dst = os.path.join(args.out, f"{table}.parquet")
        # ONE row group: the driver generator's layout (the property the
        # scan-parallelism fixes must be measured against).
        pq.write_table(big, dst, row_group_size=max(big.num_rows, 1))
        meta = pq.ParquetFile(dst).metadata
        print(f"{table}: {meta.num_rows} rows, {meta.num_row_groups} rg")
    open(os.path.join(args.out, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
