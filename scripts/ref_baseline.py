#!/usr/bin/env python3
"""Measure reference-style (pandas, eager, single-thread) timings for
the operators the reference implements, on the harness test data —
the baseline our Spark engine must match or beat at the same scale.

The snippets mirror the reference's operator semantics (SURVEY.md §2:
per-column histogram loop, corrwith, per-group ACF loop, groupby agg)
using plain public pandas APIs; nothing is copied from the reference.

Usage: python3 scripts/ref_baseline.py [sfDir]
"""
import json
import sys
import time

import numpy as np
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

li = pd.read_parquet(f"{sf}/lineitem.parquet")
ev = pd.read_parquet(f"{sf}/events.parquet")

results = {}


def bench(name):
    def deco(fn):
        t0 = time.time()
        fn()
        results[name] = round(time.time() - t0, 3)
    return deco


@bench("q1_groupby_agg")
def _():
    li.assign(disc_price=li.l_extendedprice * (1 - li.l_discount)) \
      .groupby(["l_returnflag", "l_linestatus"]) \
      .agg(sum_qty=("l_quantity", "sum"),
           sum_base=("l_extendedprice", "sum"),
           sum_disc=("disc_price", "sum"),
           avg_qty=("l_quantity", "mean"),
           n=("l_quantity", "size"))


@bench("d1_histogram_all_columns")
def _():
    # reference loops every column: data_analysis.py:44-55
    for c in li.select_dtypes(include=[np.number]).columns:
        np.histogram(li[c].dropna(), bins="auto")


@bench("d3_corrwith")
def _():
    feats = ["l_quantity", "l_discount", "l_tax"]
    li[feats].corrwith(li["l_extendedprice"])


@bench("d5_acf_per_group_loop")
def _():
    # reference loops groups in Python: data_analysis.py:105-111
    for _, g in ev.groupby("user_id"):
        x = g.sort_values(["ts", "event_id"])["value"].dropna().to_numpy()
        mu = x.mean()
        d = x - mu
        denom = (d * d).sum()
        for k in range(1, 11):
            (d[k:] * d[:-k]).sum() / denom


@bench("w2_sliding_windows")
def _():
    # reference builds per-group window lists: auto_machine_learning.py:121-131
    look_back = 4
    for _, g in ev.groupby("user_id"):
        vals = g.sort_values(["ts", "event_id"])["value"].to_numpy()
        wins = [vals[i:i + look_back] for i in range(len(vals) - look_back)]
        _ = [vals[i + look_back] for i in range(len(vals) - look_back)]


@bench("m1_standard_scale")
def _():
    x = li[["l_quantity", "l_discount"]].to_numpy()
    (x - x.mean(axis=0)) / x.std(axis=0)


@bench("ewma_per_group")
def _():
    # order-dependent recurrence, pandas-native implementation
    ev[ev.user_id < 3].sort_values(["user_id", "ts", "event_id"]) \
      .groupby("user_id")["value"].transform(
          lambda s: s.ewm(alpha=0.3, adjust=False).mean())


@bench("range_join_clicks")
def _():
    # single-node formulation: per-user sorted two-pointer sweep
    p = ev[ev.event_type == "purchase"][["user_id", "event_id", "ts"]]
    c = ev[ev.event_type == "click"][["user_id", "ts", "value"]]
    merged = p.merge(c, on="user_id", suffixes=("_p", "_c"))
    win = merged[(merged.ts_c <= merged.ts_p) &
                 (merged.ts_c >= merged.ts_p - pd.Timedelta(hours=1))]
    win.groupby("event_id").agg(n=("ts_c", "size"), s=("value", "sum"))


JACCARD_PAIRS = []


@bench("jaccard_naive_pairs")
def _():
    # single-node exact near-dup: all-pairs bigram jaccard
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    ids = docs.doc_id.to_list()
    shingle_sets = []
    for t in docs.text:
        toks = t.strip().split()
        shingle_sets.append(
            frozenset(f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)))
    n = len(shingle_sets)
    for i in range(n):
        a = shingle_sets[i]
        for j in range(i + 1, n):
            b = shingle_sets[j]
            inter = len(a & b)
            if inter and inter / (len(a) + len(b) - inter) >= 0.8:
                JACCARD_PAIRS.append((ids[i], ids[j]))


@bench("tfidf_cosine_pairs")
def _():
    # single-node sparse cosine: dict-of-dicts inverted index
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    docs = docs[docs.doc_id < 150]
    from collections import Counter, defaultdict
    import math
    tfs, dfc = {}, Counter()
    for doc_id, t in zip(docs.doc_id, docs.text):
        tf = Counter(t.strip().lower().split())
        tfs[doc_id] = tf
        dfc.update(tf.keys())
    n = len(tfs)
    w = {d: {t: c * (math.log((n + 1) / (dfc[t] + 1)) + 1)
             for t, c in tf.items()} for d, tf in tfs.items()}
    norms = {d: math.sqrt(sum(v * v for v in ws.values()))
             for d, ws in w.items()}
    inv = defaultdict(list)
    for d, ws in w.items():
        for t, v in ws.items():
            inv[t].append((d, v))
    dots = defaultdict(float)
    for t, posting in inv.items():
        for i in range(len(posting)):
            for j in range(i + 1, len(posting)):
                (a, va), (b, vb) = posting[i], posting[j]
                if a > b:
                    a, b, va, vb = b, a, vb, va
                dots[(a, b)] += va * vb
    _ = [(a, b, d / (norms[a] * norms[b]))
         for (a, b), d in dots.items() if d / (norms[a] * norms[b]) >= 0.3]


@bench("connected_components_pairs")
def _():
    # single-node union-find over the SAME Jaccard>=0.8 edges the
    # graft twin clusters (pairs from jaccard_naive_pairs above —
    # timing here covers clustering only; the graft dedup_components
    # number likewise includes its own pair generation, so compare
    # [jaccard_naive_pairs + this] with [dedup_components]).
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in JACCARD_PAIRS:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    verts = {v for p in JACCARD_PAIRS for v in p}
    _ = {d: find(d) for d in verts}


@bench("zscore_outliers")
def _():
    g = ev.sort_values(["user_id", "ts", "event_id"]).groupby("user_id")["value"]
    mean10 = g.transform(lambda s: s.shift(1).rolling(10).mean())
    std10 = g.transform(lambda s: s.shift(1).rolling(10).std())
    z = (ev["value"] - mean10) / std10
    _ = ev[z.abs() > 3]


@bench("target_encoding")
def _():
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    j = orders.merge(cust[["c_custkey", "c_mktsegment"]],
                     left_on="o_custkey", right_on="c_custkey")
    gmean = j.o_totalprice.mean()
    agg = j.groupby("c_mktsegment").o_totalprice.agg(["sum", "size"])
    _ = (agg["sum"] + 10 * gmean) / (agg["size"] + 10)


print(json.dumps({"sf": sf, "pandas_seconds": results,
                  "total": round(sum(results.values()), 3)}))
