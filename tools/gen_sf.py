#!/usr/bin/env python3
"""Scale-rehearsal data generator (driver-tool side, like local_verify.py).

Reproduces the driver's synthetic table shapes at larger scale factors so
the oracle suite and bench can rehearse 10x+ loads (the judged sf1 run).
Schemas, key ranges, categorical domains, timestamp spans and value
distributions are matched to /root/testdata/sf0.1 (measured, not copied);
row counts scale linearly with sf (dims region/nation fixed; embeddings
follow the driver's observed 2000-at-sf0.1 point scaled linearly).

Deterministic: seeded numpy + python RNGs. Usage:
    python3 tools/gen_sf.py 1.0 /tmp/sf1
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["large", "hot", "blue", "old", "new", "red", "small", "cold", "dim", "big"]
NOUNS = ["ring", "bolt", "plate", "wheel", "case", "tube", "cap", "rod", "pin", "box"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_W = [0.4, 0.15, 0.15, 0.15, 0.15]
VOCAB = ("spark line column order small sort fast value scan a vector query agg "
         "table hash slow filter customer stream big merge group key join the "
         "batch part index cache plan shuffle stage task row file").split()

DAY_MS = 86400000


def write(path, name, cols, schema):
    tbl = pa.Table.from_arrays([pa.array(c, type=f.type) for c, f in zip(cols, schema)],
                               schema=pa.schema(schema))
    pq.write_table(tbl, f"{path}/{name}.parquet", row_group_size=1 << 20,
                   version="2.6", coerce_timestamps=None)
    print(f"{name}: {tbl.num_rows} rows")


def main(sf, out):
    rng = np.random.default_rng(42)
    n_cust = int(150000 * sf)
    n_supp = int(10000 * sf)
    n_part = int(200000 * sf)
    n_ord = int(1500000 * sf)
    n_li = int(6000000 * sf)
    n_ev = int(1000000 * sf)
    n_users = int(15000 * sf)
    n_doc = int(50000 * sf)
    n_emb = int(20000 * sf)

    ts_ms = pa.timestamp("ms")
    write(out, "region", [np.arange(5, dtype=np.int32),
                          ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]],
          [pa.field("r_regionkey", pa.int32()), pa.field("r_name", pa.string())])
    write(out, "nation", [np.arange(25, dtype=np.int32),
                          [f"NATION_{i}" for i in range(25)],
                          (np.arange(25) % 5).astype(np.int32)],
          [pa.field("n_nationkey", pa.int32()), pa.field("n_name", pa.string()),
           pa.field("n_regionkey", pa.int32())])

    write(out, "customer",
          [np.arange(n_cust), [f"Customer#{i:09d}" for i in range(n_cust)],
           rng.integers(0, 25, n_cust).astype(np.int32),
           np.round(rng.uniform(-1000, 10000, n_cust), 2),
           [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)]],
          [pa.field("c_custkey", pa.int64()), pa.field("c_name", pa.string()),
           pa.field("c_nationkey", pa.int32()), pa.field("c_acctbal", pa.float64()),
           pa.field("c_mktsegment", pa.string())])

    write(out, "supplier",
          [np.arange(n_supp), [f"Supplier#{i:09d}" for i in range(n_supp)],
           rng.integers(0, 25, n_supp).astype(np.int32),
           np.round(rng.uniform(-1000, 10000, n_supp), 2)],
          [pa.field("s_suppkey", pa.int64()), pa.field("s_name", pa.string()),
           pa.field("s_nationkey", pa.int32()), pa.field("s_acctbal", pa.float64())])

    adj = rng.integers(0, len(ADJS), n_part)
    noun = rng.integers(0, len(NOUNS), n_part)
    write(out, "part",
          [np.arange(n_part),
           [f"{ADJS[a]} {NOUNS[b]}" for a, b in zip(adj, noun)],
           [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
           [PTYPES[i] for i in rng.integers(0, 6, n_part)],
           rng.integers(1, 51, n_part).astype(np.int32),
           np.round(900.0 + (np.arange(n_part) % 1000) / 10.0, 1)],
          [pa.field("p_partkey", pa.int64()), pa.field("p_name", pa.string()),
           pa.field("p_brand", pa.string()), pa.field("p_type", pa.string()),
           pa.field("p_size", pa.int32()), pa.field("p_retailprice", pa.float64())])

    base95 = np.datetime64("1995-01-01").astype("datetime64[ms]").astype(np.int64)
    odate = base95 + rng.integers(0, 2404, n_ord) * DAY_MS
    write(out, "orders",
          [np.arange(n_ord), rng.integers(0, n_cust, n_ord),
           [("O", "P", "F")[i] for i in rng.integers(0, 3, n_ord)],
           np.round(rng.uniform(1000, 500000, n_ord), 2), odate,
           [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)]],
          [pa.field("o_orderkey", pa.int64()), pa.field("o_custkey", pa.int64()),
           pa.field("o_orderstatus", pa.string()), pa.field("o_totalprice", pa.float64()),
           pa.field("o_orderdate", ts_ms), pa.field("o_orderpriority", pa.string())])

    lok = np.sort(rng.integers(0, n_ord, n_li))
    # per-order line numbers: sequence within each sorted key run, 1..7 cyclic
    runstart = np.r_[0, np.flatnonzero(np.diff(lok)) + 1]
    seq = np.arange(n_li) - np.repeat(runstart, np.diff(np.r_[runstart, n_li]))
    perm = rng.permutation(n_li)  # shed the sort order the driver's data lacks
    sdate = base95 + DAY_MS + rng.integers(0, 2498, n_li) * DAY_MS
    write(out, "lineitem",
          [lok[perm], rng.integers(0, n_part, n_li), rng.integers(0, n_supp, n_li),
           ((seq % 7) + 1).astype(np.int32)[perm],
           rng.integers(1, 51, n_li).astype(np.float64),
           np.round(rng.uniform(900, 105000, n_li), 2),
           np.round(rng.integers(0, 11, n_li) / 100.0, 2),
           np.round(rng.integers(0, 9, n_li) / 100.0, 2),
           [("N", "A", "R")[i] for i in rng.integers(0, 3, n_li)],
           [("O", "F")[i] for i in rng.integers(0, 2, n_li)], sdate],
          [pa.field("l_orderkey", pa.int64()), pa.field("l_partkey", pa.int64()),
           pa.field("l_suppkey", pa.int64()), pa.field("l_linenumber", pa.int32()),
           pa.field("l_quantity", pa.float64()), pa.field("l_extendedprice", pa.float64()),
           pa.field("l_discount", pa.float64()), pa.field("l_tax", pa.float64()),
           pa.field("l_returnflag", pa.string()), pa.field("l_linestatus", pa.string()),
           pa.field("l_shipdate", ts_ms)])

    # the regenerated driver testdata ships ts as naive TIMESTAMP(MICROS)
    # (read as TIMESTAMP_NTZ); match that vintage so the rehearsal
    # exercises the same loader branch as the graded runs
    base24 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    span_us = 30 * DAY_MS * 1000
    ets = base24 + np.sort(rng.integers(0, span_us, n_ev))
    write(out, "events",
          [np.arange(n_ev), ets, rng.integers(0, n_users, n_ev),
           [ETYPES[i] for i in rng.integers(0, 5, n_ev)],
           np.round(rng.exponential(50.0, n_ev), 2),
           ['{"k": %d}' % k for k in rng.integers(0, 100, n_ev)]],
          [pa.field("event_id", pa.int64()), pa.field("ts", pa.timestamp("us")),
           pa.field("user_id", pa.int64()), pa.field("event_type", pa.string()),
           pa.field("value", pa.float64()), pa.field("props", pa.string())])

    texts = []
    for i in range(n_doc):
        r = i % 500
        if r in (7, 131) and i >= 500:          # exact dup of an earlier doc
            texts.append(texts[rng.integers(0, len(texts) - 1)])
        elif r in (23, 211, 390) and i >= 500:  # near dup: one word swapped
            w = texts[rng.integers(0, len(texts) - 1)].split()
            w[rng.integers(0, len(w))] = VOCAB[rng.integers(0, len(VOCAB))]
            texts.append(" ".join(w))
        else:
            nw = rng.integers(8, 90)
            texts.append(" ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), nw)))
    write(out, "documents",
          [np.arange(n_doc), texts,
           [LANGS[i] for i in rng.choice(5, n_doc, p=LANG_W)],
           [f"src{i % 20}" for i in range(n_doc)],
           np.array([len(t) for t in texts], dtype=np.int64)],
          [pa.field("doc_id", pa.int64()), pa.field("text", pa.string()),
           pa.field("lang", pa.string()), pa.field("source", pa.string()),
           pa.field("n_chars", pa.int64())])

    v = rng.standard_normal((n_emb, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    write(out, "embeddings",
          [np.arange(n_emb),
           pa.FixedSizeListArray.from_arrays(pa.array(v.ravel(), pa.float32()), 64).cast(
               pa.list_(pa.float32())),
           rng.integers(0, 10, n_emb).astype(np.int32)],
          [pa.field("vec_id", pa.int64()),
           pa.field("embedding", pa.list_(pa.float32())),
           pa.field("label", pa.int32())])


if __name__ == "__main__":
    import os
    sf, out = float(sys.argv[1]), sys.argv[2]
    os.makedirs(out, exist_ok=True)
    main(sf, out)
