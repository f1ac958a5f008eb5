#!/usr/bin/env python3
"""Skewed sf1 fixture generator (driver-side tooling, like check_oracle).

The driver's synthetic testdata (TESTDATA.md) is uniform by
construction, so every x100 scale receipt to date replicates uniform
rows. This generates a 10x-sf0.1 ("sf1") fixture with the REAL skew
axes the 100 TB claims must survive:

  - heavy-tailed document lengths (lognormal, clipped to [30, 50k]
    chars — a few book-length outliers among tweet-sized rows);
  - duplicate clusters with Zipf sizes (one near-dup cluster holds
    ~several % of the corpus; most docs are singletons);
  - hot keys: Zipf order->customer, lineitem->part, event->user
    (the top user owns a few % of all events);
  - skewed embedding cells: Zipf label sizes around Gaussian
    centroids (one hot IVF cell).

Schemas match the driver fixture EXACTLY (names, arrow types), so the
whole Verify battery + check_oracle run unchanged against the output
dir. Deterministic: seed 42.

Usage: gen_sf1skew.py <outDir> [scale=10]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42


def zipf_keys(rng, n, n_keys, a):
    """n draws over [0, n_keys) with Zipf(a) popularity, shuffled key
    identity (so the hot key is not always key 0)."""
    ranks = rng.zipf(a, size=n)
    ranks = np.clip(ranks, 1, n_keys) - 1
    perm = rng.permutation(n_keys)
    return perm[ranks]


def write(out, name, table):
    """Large tables land as a DIRECTORY of part files (like any real
    corpus — and like Spark's own output): a single-file table caps
    every scan-side pipeline at 1-2 tasks (maxPartitionBytes splits
    FILES, not row groups), which serialized the whole dup-heavy gram
    join at sf1skew until the first exchange — measured round 16, the
    executor pegged one core for 10+ min in a partial aggregation.
    Target ~24 parts for anything above ~100k rows; small dims stay
    single-file."""
    n = table.num_rows
    if n < 10_000:
        pq.write_table(table, f"{out}/{name}.parquet")
    else:
        import os
        d = f"{out}/{name}.parquet"
        os.makedirs(d, exist_ok=True)
        parts = 24
        step = (n + parts - 1) // parts
        for i in range(parts):
            lo = i * step
            if lo >= n:
                break
            pq.write_table(table.slice(lo, step),
                           f"{d}/part-{i:05d}.parquet")
    print(f"{name}: {n} rows")


def main():
    out = sys.argv[1]
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    rng = np.random.default_rng(SEED)
    import os
    os.makedirs(out, exist_ok=True)

    n_cust = int(15000 * scale)
    n_supp = int(1000 * scale)
    n_part = int(20000 * scale)
    n_ord = int(150000 * scale)
    n_ev = int(100000 * scale)
    n_doc = int(5000 * scale)
    n_vec = int(2000 * scale)

    # region / nation: fixed tiny dims, same shape as the driver's
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": regions}))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    write(out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": np.array(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
             "HOUSEHOLD"])[rng.integers(0, 5, n_cust)]}))
    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2)}))
    write(out, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"part {i} name" for i in range(n_part)],
        "p_brand": np.array([f"Brand#{i}" for i in range(1, 6)])[
            rng.integers(0, 5, n_part)],
        "p_type": np.array([f"TYPE {c}" for c in "ABCDEFGH"])[
            rng.integers(0, 8, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2)}))

    # orders: HOT CUSTOMERS (zipf a=1.3 -> top customer owns ~1-2%)
    day_us = 86_400_000_000
    o_date = (np.datetime64("1995-01-01").astype("datetime64[us]")
              .astype(np.int64) + rng.integers(0, 2405, n_ord) * day_us)
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(zipf_keys(rng, n_ord, n_cust, 1.3),
                              pa.int64()),
        "o_orderstatus": np.array(["F", "O", "P"])[
            rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])],
        "o_totalprice": np.round(rng.uniform(900, 500000, n_ord), 2),
        "o_orderdate": pa.array(o_date, pa.timestamp("us")),
        "o_orderpriority": np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"])[rng.integers(0, 5, n_ord)]}))

    # lineitem: HEAVY-TAILED lines-per-order (hot orders) and HOT
    # PARTS (zipf) — the skew axes a shuffle-on-key plan must survive
    lines = np.clip(rng.zipf(1.9, n_ord), 1, 60)
    total = int(lines.sum())
    l_ok = np.repeat(np.arange(n_ord, dtype=np.int64), lines)
    l_ln = np.concatenate([np.arange(1, k + 1, dtype=np.int32)
                           for k in lines])
    ship = (o_date.repeat(lines) +
            rng.integers(1, 121, total) * day_us)
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_ok, pa.int64()),
        "l_partkey": pa.array(zipf_keys(rng, total, n_part, 1.25),
                              pa.int64()),
        "l_suppkey": pa.array(zipf_keys(rng, total, n_supp, 1.4),
                              pa.int64()),
        "l_linenumber": pa.array(l_ln, pa.int32()),
        "l_quantity": rng.integers(1, 51, total).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100000, total), 2),
        "l_discount": np.round(rng.integers(0, 11, total) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, total) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[
            rng.choice(3, total, p=[0.25, 0.5, 0.25])],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, total)],
        "l_shipdate": pa.array(ship, pa.timestamp("us"))}))

    # events: HOT USERS (the sessionization / grouped-agg skew axis)
    ev_user = zipf_keys(rng, n_ev, max(1, n_ev // 100), 1.2)
    ts0 = (np.datetime64("2024-01-01").astype("datetime64[us]")
           .astype(np.int64))
    ts = np.sort(ts0 + rng.integers(0, 30 * day_us, n_ev))
    write(out, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(ev_user, pa.int64()),
        "event_type": np.array(
            ["click", "view", "purchase", "signup", "error"])[
            rng.choice(5, n_ev, p=[0.5, 0.3, 0.1, 0.05, 0.05])],
        "value": np.round(rng.exponential(50, n_ev), 3),
        "props": np.array([f'{{"k": {k}}}' for k in range(10)])[
            rng.integers(0, 10, n_ev)]}))

    # documents: heavy-tail lengths + zipf-sized NEAR-DUP clusters.
    # The vocabulary must carry REAL stopword mass (like the driver
    # fixture's "a a the ... table scan" style): the engine's quality
    # model scores stopword/digit/length ratios, and an all-synthetic
    # w042-style vocabulary flunks EVERY doc below the curation
    # threshold — st13's curated table came out empty on the first
    # sf1skew cut (measured round 16), which is fixture unrealism,
    # not engine behavior.
    stopwords = np.array(["a", "the", "of", "and", "to", "in", "is",
                          "on", "for", "with"])
    vocab = np.array([f"w{i:03d}" for i in range(600)])
    langs = np.array(["en", "es", "de", "zh", "fr"])
    sources = np.array([f"src{i}" for i in range(20)])

    def make_text(n_tok):
        toks = vocab[rng.integers(0, len(vocab), n_tok)]
        stop_mask = rng.random(n_tok) < 0.35
        toks[stop_mask] = stopwords[
            rng.integers(0, len(stopwords), int(stop_mask.sum()))]
        return " ".join(toks)

    # cluster sizes: zipf — a handful of big clusters, a long tail of
    # singletons; ~40% of docs live in a multi-doc cluster
    doc_texts = [None] * n_doc
    doc_ids = np.arange(n_doc, dtype=np.int64)
    clustered = int(n_doc * 0.4)
    sizes = []
    left = clustered
    while left > 0:
        s = int(np.clip(rng.zipf(1.6), 2, max(2, n_doc // 20)))
        s = min(s, left) if left >= 2 else 2
        sizes.append(s)
        left -= s
    pos = 0
    for s in sizes:
        # base doc: heavy-tail length
        n_tok = int(np.clip(rng.lognormal(4.0, 1.1), 6, 9000))
        base = make_text(n_tok)
        toks = base.split(" ")
        for j in range(s):
            if j == 0 or rng.random() < 0.3:
                doc_texts[pos] = base  # exact duplicate
            else:
                # near-dup: mutate ~2% of tokens
                t = list(toks)
                for _ in range(max(1, len(t) // 50)):
                    t[rng.integers(0, len(t))] = vocab[
                        rng.integers(0, len(vocab))]
                doc_texts[pos] = " ".join(t)
            pos += 1
    for i in range(pos, n_doc):
        n_tok = int(np.clip(rng.lognormal(4.0, 1.1), 6, 9000))
        doc_texts[i] = make_text(n_tok)
    perm = rng.permutation(n_doc)
    doc_texts = [doc_texts[i] for i in perm]
    write(out, "documents", pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": doc_texts,
        "lang": langs[rng.choice(5, n_doc,
                                 p=[0.55, 0.15, 0.12, 0.1, 0.08])],
        "source": sources[rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in doc_texts], pa.int64())}))

    # embeddings: zipf LABEL sizes (one hot cell) around gaussian
    # centroids — the IVF cellCap / skew-join axis
    dim = 64
    label_of = zipf_keys(rng, n_vec, 10, 1.4).astype(np.int32)
    centroids = rng.normal(0, 1, (10, dim)).astype(np.float32)
    vecs = (centroids[label_of] +
            rng.normal(0, 0.35, (n_vec, dim)).astype(np.float32))
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array([v for v in vecs.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(label_of, pa.int32())}))


if __name__ == "__main__":
    main()
