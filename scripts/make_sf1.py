#!/usr/bin/env python3
"""Driver-side tooling: synthesize an sf1 soak dataset (10x sf0.1)
under target/testdata/sf1 by key-shifted copies of the sf0.1 tables.

Perturbations are chosen so workload scales LINEARLY (the realistic
shape), never quadratically via cross-copy duplicates:
  - documents: copy i>0 suffixes every word with '_c<i>' - a BIJECTIVE
    per-copy vocabulary relabeling, so every shingle-set relation
    (Jaccard, containment, frequency) is preserved EXACTLY within a
    copy while cross-copy shingles are disjoint; near-dup pairs scale
    ~10x. (An earlier between-words token injection made every bigram
    contain the injected token, inflating pairwise similarity and
    exploding PPJoin candidates ~quadratically - 60 GB of shuffle
    spill at sf1.);
  - embeddings: copy i rotates the vector by i positions - a
    permutation is orthogonal, so within-copy cosines are EXACT while
    cross-copy cosines decorrelate;
  - star schema: foreign keys shift by per-table strides so joins stay
    referentially intact.

Usage: python3 scripts/make_sf1.py [srcDir] [outDir] [copies]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/testdata/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def stride(table, key):
    return con.sql(
        f"SELECT MAX({key}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]


C = stride("customer", "c_custkey")
S = stride("supplier", "s_suppkey")
P = stride("part", "p_partkey")
O = stride("orders", "o_orderkey")
E = stride("events", "event_id")
U = stride("events", "user_id")
D = stride("documents", "doc_id")
V = stride("embeddings", "vec_id")
DIM = con.sql(
    f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1"
).fetchone()[0]


def copy_union(select_fmt, table):
    parts = [select_fmt.format(i=i, src=f"'{SRC}/{table}.parquet'")
             for i in range(COPIES)]
    return " UNION ALL ".join(parts)


def write(table, sql):
    con.sql(f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT COUNT(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


# dimension tables stay as-is (like TPC-H region/nation at every SF)
for t in ("region", "nation"):
    write(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

write("customer", copy_union(
    f"SELECT c_custkey + {{i}} * {C} AS c_custkey, c_name, c_nationkey, "
    "c_acctbal, c_mktsegment FROM {src}", "customer"))
write("supplier", copy_union(
    f"SELECT s_suppkey + {{i}} * {S} AS s_suppkey, s_name, s_nationkey, "
    "s_acctbal FROM {src}", "supplier"))
write("part", copy_union(
    f"SELECT p_partkey + {{i}} * {P} AS p_partkey, p_name, p_brand, p_type, "
    "p_size, p_retailprice FROM {src}", "part"))
write("orders", copy_union(
    f"SELECT o_orderkey + {{i}} * {O} AS o_orderkey, "
    f"o_custkey + {{i}} * {C} AS o_custkey, o_orderstatus, o_totalprice, "
    "o_orderdate, o_orderpriority FROM {src}", "orders"))
li_cols = [r[0] for r in con.sql(
    f"DESCRIBE SELECT * FROM '{SRC}/lineitem.parquet'").fetchall()]
li_rest = ", ".join(c for c in li_cols
                    if c not in ("l_orderkey", "l_partkey", "l_suppkey"))
write("lineitem", copy_union(
    f"SELECT l_orderkey + {{i}} * {O} AS l_orderkey, "
    f"l_partkey + {{i}} * {P} AS l_partkey, "
    f"l_suppkey + {{i}} * {S} AS l_suppkey, {li_rest} FROM {{src}}",
    "lineitem"))
# ts must land as an instant (isAdjustedToUTC) in parquet: plain DuckDB
# TIMESTAMP writes NTZ, which Spark reads as TIMESTAMP_NTZ and
# unix_micros() rejects
con.sql("SET TimeZone = 'UTC'")
write("events", copy_union(
    f"SELECT event_id + {{i}} * {E} AS event_id, "
    "CAST(ts AS TIMESTAMPTZ) AS ts, "
    f"user_id + {{i}} * {U} AS user_id, event_type, value, props "
    "FROM {src}", "events"))
write("documents", copy_union(
    f"SELECT doc_id + {{i}} * {D} AS doc_id, "
    "CASE WHEN {i} = 0 THEN text "
    r"     ELSE regexp_replace(text, '(\S+)', '\1_c{i}', 'g') END AS text, "
    "lang, source, "
    "CAST(length(CASE WHEN {i} = 0 THEN text "
    r"     ELSE regexp_replace(text, '(\S+)', '\1_c{i}', 'g') END) "
    "AS BIGINT) AS n_chars "
    "FROM {src}", "documents"))
write("embeddings", copy_union(
    f"SELECT vec_id + {{i}} * {V} AS vec_id, "
    "CASE WHEN {i} = 0 THEN embedding ELSE "
    f"list_concat(embedding[{{i}}+1:{DIM}], embedding[1:{{i}}]) END "
    "AS embedding, label FROM {src}", "embeddings"))
print(f"sf1 written to {OUT}")
