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


@bench("jaccard_naive_pairs")
def _():
    # single-node exact near-dup: all-pairs bigram jaccard
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    shingle_sets = []
    for t in docs.text:
        toks = t.strip().split()
        shingle_sets.append(
            frozenset(f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)))
    n = len(shingle_sets)
    hits = 0
    for i in range(n):
        a = shingle_sets[i]
        for j in range(i + 1, n):
            b = shingle_sets[j]
            inter = len(a & b)
            if inter and inter / (len(a) + len(b) - inter) >= 0.8:
                hits += 1


print(json.dumps({"sf": sf, "pandas_seconds": results,
                  "total": round(sum(results.values()), 3)}))
