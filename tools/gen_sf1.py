#!/usr/bin/env python3
"""Generate sf1 (10x sf0.1) test data for the SCALE.md bench — local
tooling only, never part of the library. Deterministic (hash-keyed, no
RNG state): each table is 10 key-shifted replicas of sf0.1, with the
content columns that would otherwise create artificial duplicates
rewritten per replica:

- relational tables (customer/supplier/part/orders/lineitem/events):
  keys shift by replica * max-key so FK joins keep the same fan-out;
  value columns copy (duplicate VALUES are normal in relational data).
- documents: per-replica deterministic PERMUTATION of each doc's words —
  same length, same token multiset per doc (so language/length/quality
  distributions are preserved) but different shingles/bigrams/hashes, so
  dedup operators see the natural near-dup rate instead of 10 planted
  copies of every document.
- embeddings: per-replica deterministic absolute perturbation (+-0.02 per
  element, small vs the unit-ish component scale), preserving the cluster
  structure ANN operators key on.

Usage: python3 tools/gen_sf1.py [outDir]   (default scaledata/sf1)
"""
import sys, os, shutil
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "scaledata/sf1"
R = 10  # replicas

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO 16")

def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

# Key strides are DERIVED from the source data (max key + 1), not
# hardcoded: if sf0.1 cardinalities ever change, constants would silently
# collide replica keys and corrupt FK fan-out / dedup rates (ADVICE r13).
# Each FK column shifts by ITS referenced table's stride so joins keep
# the same per-replica fan-out.
def stride(table, key):
    return con.execute(f"SELECT max({key}) + 1 FROM {src(table)}").fetchone()[0]

CUST = stride("customer", "c_custkey")
SUPP = stride("supplier", "s_suppkey")
PART = stride("part", "p_partkey")
ORDR = stride("orders", "o_orderkey")
EVNT = stride("events", "event_id")
USER = stride("events", "user_id")
DOC = stride("documents", "doc_id")
VEC = stride("embeddings", "vec_id")

def gen(table, sql_per_replica):
    parts = " UNION ALL ".join(sql_per_replica(i) for i in range(R))
    con.execute(f"COPY ({parts}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")

# dimension tables: verbatim copies (fixed cardinality at every SF)
for t in ("region", "nation"):
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    print(f"{t}: copied")

gen("customer", lambda i: f"""
  SELECT c_custkey + {i * CUST} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment FROM {src('customer')}""")

gen("supplier", lambda i: f"""
  SELECT s_suppkey + {i * SUPP} AS s_suppkey, s_name, s_nationkey,
         s_acctbal FROM {src('supplier')}""")

gen("part", lambda i: f"""
  SELECT p_partkey + {i * PART} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice FROM {src('part')}""")

gen("orders", lambda i: f"""
  SELECT o_orderkey + {i * ORDR} AS o_orderkey,
         o_custkey + {i * CUST} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}""")

gen("lineitem", lambda i: f"""
  SELECT l_orderkey + {i * ORDR} AS l_orderkey,
         l_partkey + {i * PART} AS l_partkey,
         l_suppkey + {i * SUPP} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}""")

gen("events", lambda i: f"""
  SELECT event_id + {i * EVNT} AS event_id, ts,
         user_id + {i * USER} AS user_id,
         event_type, value, props FROM {src('events')}""")

# documents: replica 0 verbatim; replicas 1..9 permute each doc's words
# deterministically (hash-ordered), preserving length and token multiset
def doc_sql(i):
    if i == 0:
        return f"SELECT doc_id, text, lang, source, n_chars FROM {src('documents')}"
    return f"""
  SELECT d.doc_id + {i * DOC} AS doc_id,
    array_to_string(list_transform(list_sort(list_transform(
        regexp_split_to_array(d.text, ' '),
        (w, pos) -> {{'k': hash(d.doc_id * 1000003 + pos * 31 + {i}), 'w': w}})),
      s -> s.w), ' ') AS text,
    d.lang, d.source, d.n_chars
  FROM {src('documents')} d"""
gen("documents", doc_sql)

# embeddings: replica 0 verbatim; replicas 1..9 perturb each element by
# deterministic ABSOLUTE hash noise in [-0.02, 0.02] (small vs the unit-ish
# component scale, so cluster structure is preserved)
def emb_sql(i):
    if i == 0:
        return f"SELECT vec_id, embedding, label FROM {src('embeddings')}"
    return f"""
  SELECT e.vec_id + {i * VEC} AS vec_id,
    list_transform(e.embedding,
      (x, pos) -> CAST(x + 0.02 * ((hash(e.vec_id * 131071 + pos * 17 + {i}) % 1001) / 500.0 - 1.0) AS FLOAT)) AS embedding,
    e.label
  FROM {src('embeddings')} e"""
gen("embeddings", emb_sql)

print("done:", OUT)
