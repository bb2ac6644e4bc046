#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir] [jsonOut]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
For each query parquet in outDir and its SQL in oracle_sql.json, runs
the SQL in DuckDB with views named after the test tables, then
compares (columns sorted by name, rows sorted by all columns).

With `jsonOut`, also writes a driver-artifact-shaped JSON record
(per-query status + totals + git head) — the builder's own committed
CORRECTNESS_SELF.json, so a driver-side artifact failure (r13: an
empty CORRECTNESS_r13.json while the gate was green) is detectable
against an in-repo record.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    statuses = {}
    import glob
    import os
    dirs = sorted(d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    for qdir in dirs:
        name = os.path.basename(qdir)
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows "
                  f"{'OK' if len(got) > 0 else 'EMPTY!'}")
            statuses[name] = ("rows_only" if len(got) > 0
                              else "rows_only_empty")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  [FAIL-sql ] {name}: oracle SQL error: {e}")
            statuses[name] = "fail_sql"
            n_fail += 1
            continue
        got_n, exp_n = norm(got), norm(exp)
        if list(got_n.columns) != list(exp_n.columns):
            print(f"  [FAIL-cols] {name}: spark={list(got_n.columns)} "
                  f"oracle={list(exp_n.columns)}")
            statuses[name] = "fail_cols"
            n_fail += 1
            continue
        if len(got_n) != len(exp_n):
            print(f"  [FAIL-rows] {name}: spark={len(got_n)} oracle={len(exp_n)}")
            statuses[name] = "fail_rows"
            n_fail += 1
            continue
        bad = None
        import numpy as np
        for c in got_n.columns:
            ga, ea = got_n[c].to_numpy(), exp_n[c].to_numpy()
            if ga.dtype.kind == 'f' and ea.dtype.kind == 'f':
                neq = ~((ga == ea) | (np.isnan(ga) & np.isnan(ea)))
            else:
                gn, en = got_n[c].isna().to_numpy(), exp_n[c].isna().to_numpy()
                neq = ~(((got_n[c] == exp_n[c]) & ~gn & ~en) | (gn & en)
                        ).to_numpy()
            if neq.any():
                i = int(np.argmax(neq))
                bad = (i, c, got_n[c].iloc[i], exp_n[c].iloc[i])
                break
        if bad:
            i, c, a, b = bad
            print(f"  [FAIL-val ] {name}: row {i} col {c}: spark={a!r} oracle={b!r}")
            statuses[name] = "fail_val"
            n_fail += 1
        else:
            print(f"  [PASS     ] {name}: {len(got_n)} rows")
            statuses[name] = "pass"
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(dirs) - n_pass - n_fail} rows-only ==")
    if json_out:
        import subprocess
        import time
        try:
            head = subprocess.run(["git", "rev-parse", "HEAD"],
                                  capture_output=True, text=True,
                                  timeout=10).stdout.strip()
        except Exception:
            head = "unknown"
        record = {
            "sf_dir": sf_dir,
            "git_head": head,
            "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime()),
            "n_pass": n_pass,
            "n_fail": n_fail,
            "n_rows_only": len(dirs) - n_pass - n_fail,
            "queries": statuses,
        }
        with open(json_out, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
