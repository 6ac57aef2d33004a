#!/usr/bin/env python3
"""Generate an ORGANIC 10x (sf1) stress dataset from the sf0.1
marginals — new keys, not offset replicas (round-5's replication
flatters distinct-value/rank-map operators because replicated keys
understate domain growth).

Every key domain grows 10x (customers, suppliers, parts, orders,
lineitems, event users, docs, vectors) and every attribute is drawn
from the sf0.1 EMPIRICAL distribution via a deterministic
hash-donor pick, with hash-jitter on continuous columns so
distinct-value counts grow organically. Document text is built by
CROSS-OVER recombination of two donor docs plus fresh tokens drawn
from a 2x-original-doc-count domain (Heaps-plausible vocab growth —
the driver's synthetic corpus has a SATURATED ~31-token vocabulary,
so injected types are what makes rank/agg domains actually scale),
with planted exact-duplicate (3%) and near-duplicate (3%) pairs so
dedup workloads keep real structure.

All randomness is hash(key || salt) — fully deterministic, no RNG
state, reproducible regardless of parallelism.

Usage: python3 scripts/gen_sf1_organic.py [SRC_DIR] [OUT_DIR] [SCALE]
Defaults: /root/testdata/sf0.1 -> /tmp/graft_sf1_organic at SCALE=10
(SCALE=30 gives the sf3-organic 30x stress set).
"""
import sys, os, time
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1_organic"
SCALE = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")

for t in ["nation", "region", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'")

def counts(sql):
    return con.execute(sql).fetchone()[0]

N_CUST = counts("SELECT count(*) FROM customer") * SCALE
N_SUPP = counts("SELECT count(*) FROM supplier") * SCALE
N_PART = counts("SELECT count(*) FROM part") * SCALE
N_ORD = counts("SELECT count(*) FROM orders") * SCALE
N_LINE = counts("SELECT count(*) FROM lineitem") * SCALE
N_EVT = counts("SELECT count(*) FROM events") * SCALE
N_USER = counts("SELECT count(DISTINCT user_id) FROM events") * SCALE
N_DOC = counts("SELECT count(*) FROM documents") * SCALE
N_VEC = counts("SELECT count(*) FROM embeddings") * SCALE

# uniform in [0,1) from a key + salt, deterministic
def u(expr, salt):
    return f"((hash({expr} || '{salt}') % 1000000) / 1000000.0)"

def pick(expr, salt, n):  # 1..n donor row pick
    return f"(1 + hash({expr} || '{salt}') % {n})"

def write(name, sql):
    t0 = time.time()
    con.execute(
        f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = counts(f"SELECT count(*) FROM '{OUT}/{name}.parquet'")
    print(f"{name}: {n} rows in {time.time()-t0:.1f}s", flush=True)

# fixed domains: copy
write("region", "SELECT * FROM region")
write("nation", "SELECT * FROM nation")

# donor tables with a dense 1..n rowid for hash-joins
con.execute("CREATE TABLE dcust AS SELECT row_number() OVER () AS rid, * FROM customer")
con.execute("CREATE TABLE dsupp AS SELECT row_number() OVER () AS rid, * FROM supplier")
con.execute("CREATE TABLE dpart AS SELECT row_number() OVER () AS rid, * FROM part")
con.execute("CREATE TABLE dord  AS SELECT row_number() OVER () AS rid, * FROM orders")
con.execute("CREATE TABLE dline AS SELECT row_number() OVER () AS rid, * FROM lineitem")
con.execute("CREATE TABLE devt  AS SELECT row_number() OVER () AS rid, * FROM events")
con.execute("CREATE TABLE ddoc  AS SELECT row_number() OVER () AS rid, * FROM documents")
con.execute("CREATE TABLE dvec  AS SELECT row_number() OVER () AS rid, * FROM embeddings")

NC0 = N_CUST // SCALE
write("customer", f"""
SELECT CAST(k AS BIGINT) AS c_custkey,
  'Customer#' || lpad(CAST(k AS VARCHAR), 9, '0') AS c_name,
  d.c_nationkey,
  round(d.c_acctbal + ({u('k', 'cb')} - 0.5) * 20.0, 2) AS c_acctbal,
  d.c_mktsegment
FROM range(0, {N_CUST}) r(k)
JOIN dcust d ON d.rid = {pick('k', 'cd', NC0)}""")

NS0 = N_SUPP // SCALE
write("supplier", f"""
SELECT CAST(k AS BIGINT) AS s_suppkey,
  'Supplier#' || lpad(CAST(k AS VARCHAR), 9, '0') AS s_name,
  d.s_nationkey,
  round(d.s_acctbal + ({u('k', 'sb')} - 0.5) * 20.0, 2) AS s_acctbal
FROM range(0, {N_SUPP}) r(k)
JOIN dsupp d ON d.rid = {pick('k', 'sd', NS0)}""")

NP0 = N_PART // SCALE
# p_name: crossover of two donor names (word-level) -> organic
# distinct-name growth from the empirical color-word vocabulary
write("part", f"""
SELECT CAST(k AS BIGINT) AS p_partkey,
  string_split(d1.p_name, ' ')[1] || ' ' ||
    string_split(d2.p_name, ' ')[len(string_split(d2.p_name, ' '))]
    AS p_name,
  d1.p_brand, d2.p_type,
  CAST(1 + hash(k || 'ps') % 50 AS INTEGER) AS p_size,
  round(d1.p_retailprice + ({u('k', 'pp')} - 0.5) * 10.0, 2)
    AS p_retailprice
FROM range(0, {N_PART}) r(k)
JOIN dpart d1 ON d1.rid = {pick('k', 'p1', NP0)}
JOIN dpart d2 ON d2.rid = {pick('k', 'p2', NP0)}""")

NO0 = N_ORD // SCALE
write("orders", f"""
SELECT CAST(k AS BIGINT) AS o_orderkey,
  CAST(hash(k || 'oc') % {N_CUST} AS BIGINT) AS o_custkey,
  d.o_orderstatus,
  round(d.o_totalprice + ({u('k', 'op')} - 0.5) * 100.0, 2)
    AS o_totalprice,
  d.o_orderdate + INTERVAL (CAST(hash(k || 'od') % 7 AS BIGINT) - 3) DAY
    AS o_orderdate,
  d.o_orderpriority
FROM range(0, {N_ORD}) r(k)
JOIN dord d ON d.rid = {pick('k', 'do', NO0)}""")

NL0 = N_LINE // SCALE
# line -> order assignment via hash (lines-per-order ~ Binomial, mean
# = original); l_linenumber = per-order sequence (unique pairs)
write("lineitem", f"""
SELECT o_orderkey AS l_orderkey, l_partkey, l_suppkey,
  CAST(row_number() OVER (PARTITION BY o_orderkey ORDER BY k)
    AS INTEGER) AS l_linenumber,
  l_quantity, l_extendedprice, l_discount, l_tax,
  l_returnflag, l_linestatus, l_shipdate
FROM (
  SELECT k,
    CAST(hash(k || 'lo') % {N_ORD} AS BIGINT) AS o_orderkey,
    CAST(hash(k || 'lp') % {N_PART} AS BIGINT) AS l_partkey,
    CAST(hash(k || 'ls') % {N_SUPP} AS BIGINT) AS l_suppkey,
    d.l_quantity,
    round(d.l_extendedprice + ({u('k', 'le')} - 0.5) * 50.0, 2)
      AS l_extendedprice,
    d.l_discount, d.l_tax, d.l_returnflag, d.l_linestatus,
    d.l_shipdate + INTERVAL (CAST(hash(k || 'lsd') % 7 AS BIGINT) - 3) DAY
      AS l_shipdate
  FROM range(0, {N_LINE}) r(k)
  JOIN dline d ON d.rid = {pick('k', 'ld', NL0)})""")

NE0 = N_EVT // SCALE
write("events", f"""
SELECT CAST(k AS BIGINT) AS event_id,
  d.ts + INTERVAL (CAST(hash(k || 'ej') % 3600 AS BIGINT) - 1800) SECOND AS ts,
  CAST(hash(k || 'eu') % {N_USER} AS BIGINT) AS user_id,
  d.event_type,
  round(d.value + ({u('k', 'ev')} - 0.5) * 2.0, 2) AS value,
  d.props
FROM range(0, {N_EVT}) r(k)
JOIN devt d ON d.rid = {pick('k', 'ed', NE0)}""")

ND0 = N_DOC // SCALE
# text: first half of donor1 + second half of donor2 + fresh tokens
# (organic vocab growth); then plant dup structure among NEW docs:
#   k % 33 == 1 -> exact copy of doc (k - 1)
#   k % 33 == 2 -> near-copy of doc (k - 2) (one fresh token appended)
con.execute(f"""
CREATE TABLE newdoc AS
SELECT k,
  array_to_string(
    list_slice(w1, 1, greatest(1, len(w1) // 2)) ||
    list_slice(w2, greatest(1, len(w2) // 2 + 1), len(w2)) ||
    ['nw' || CAST(hash(k || 'f1') % {2 * ND0} AS VARCHAR),
     'nw' || CAST(hash(k || 'f2') % {2 * ND0} AS VARCHAR),
     'nw' || CAST(hash(k || 'f3') % {2 * ND0} AS VARCHAR),
     'nw' || CAST(hash(k || 'f4') % {2 * ND0} AS VARCHAR),
     'nw' || CAST(hash(k || 'f5') % {2 * ND0} AS VARCHAR)], ' ')
    AS text,
  lang, source
FROM (
  SELECT k, string_split(d1.text, ' ') AS w1,
    string_split(d2.text, ' ') AS w2, d1.lang, d1.source
  FROM range(0, {N_DOC}) r(k)
  JOIN ddoc d1 ON d1.rid = {pick('k', 'g1', ND0)}
  JOIN ddoc d2 ON d2.rid = {pick('k', 'g2', ND0)})""")
write("documents", f"""
SELECT CAST(a.k AS BIGINT) AS doc_id,
  CASE WHEN a.k % 33 = 1 AND e.text IS NOT NULL THEN e.text
       WHEN a.k % 33 = 2 AND n.text IS NOT NULL
         THEN n.text || ' nd' || CAST(a.k AS VARCHAR)
       ELSE a.text END AS text,
  a.lang, a.source,
  length(CASE WHEN a.k % 33 = 1 AND e.text IS NOT NULL THEN e.text
       WHEN a.k % 33 = 2 AND n.text IS NOT NULL
         THEN n.text || ' nd' || CAST(a.k AS VARCHAR)
       ELSE a.text END) AS n_chars
FROM newdoc a
LEFT JOIN newdoc e ON a.k % 33 = 1 AND e.k = a.k - 1
LEFT JOIN newdoc n ON a.k % 33 = 2 AND n.k = a.k - 2""")

NV0 = N_VEC // SCALE
write("embeddings", f"""
SELECT CAST(k AS BIGINT) AS vec_id,
  list_transform(d.embedding, (x, i) -> CAST(x +
    ((hash(k || '-' || i || 'vj') % 1000) / 1000.0 - 0.5) * 0.05
    AS FLOAT)) AS embedding,
  d.label
FROM range(0, {N_VEC}) r(k)
JOIN dvec d ON d.rid = {pick('k', 'vd', NV0)}""")

print("done ->", OUT)
