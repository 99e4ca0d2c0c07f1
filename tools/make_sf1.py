#!/usr/bin/env python3
"""Build /tmp/sf1: a 10x replication of /root/testdata/sf0.1 for scaling
measurements (driver-side tooling only - the engine never runs this).

Replicas get offset keys so joins keep their selectivity; dimension tables
(region/nation/supplier/part/customer) are copied as-is so the broadcast-dim
story is unchanged.

Document and embedding replicas are MUTATED, not cloned: every ~20th token
of a replica's text is swapped for a deterministic variant token (hash of
doc, replica, position), and each embedding component gets a +-0.01
deterministic jitter. Exact clones made every near-dup measurement
exercise the clone-group fast path (and pair miners go clone-quadratic by
construction); ~5% token noise gives realistic ~0.9-Jaccard /
~0.999-cosine neighbors so LSH banding, PPJoin verification and
semantic-dedup measurements hit their real code paths at 10x/30x.
Replica 0 stays pristine.

Each table is written as a DIRECTORY of 16 parquet files. A single
monolithic file is NOT representative of warehouse layout: 50k highly
repetitive docs compress to <1MB = one row group = ONE Spark input split,
which serializes every scan-adjacent kernel stage. (Measured: q48 26s on
the monolith vs ~4s on the same rows split 16 ways.)
"""
import sys
import duckdb
import os

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
FILES = 16

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {FILES}")

def write(name, sql, key=None):
    out = f"{DST}/{name}.parquet"
    if key is None:  # small dims: one file is fine
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        print(f"{name}: 1 file")
        return
    # a directory of parquet files, like a real warehouse table (explicit
    # bucket loop: DuckDB's PER_THREAD_OUTPUT degrades to one file when the
    # producing pipeline is single-threaded)
    os.makedirs(out, exist_ok=True)
    for b in range(FILES):
        con.execute(f"COPY (SELECT * FROM ({sql}) WHERE hash({key}) % {FILES} = {b}) "
                    f"TO '{out}/part-{b:05d}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{out}/*.parquet'").fetchone()[0]
    print(f"{name}: {n} rows, {len(os.listdir(out))} files")

def src(name):
    return f"read_parquet('{SRC}/{name}.parquet')"

rep = f"range({COPIES}) r(i)"

# key spans (max+1) for offsetting
mo = con.sql(f"SELECT max(o_orderkey)+1 FROM {src('orders')}").fetchone()[0]
me = con.sql(f"SELECT max(event_id)+1 FROM {src('events')}").fetchone()[0]
mu = con.sql(f"SELECT max(user_id)+1 FROM {src('events')}").fetchone()[0]
md = con.sql(f"SELECT max(doc_id)+1 FROM {src('documents')}").fetchone()[0]
mv = con.sql(f"SELECT max(vec_id)+1 FROM {src('embeddings')}").fetchone()[0]

for dim in ["region", "nation", "supplier", "part", "customer"]:
    write(dim, f"SELECT * FROM {src(dim)}")

write("orders", key="o_orderkey", sql=f"""
  SELECT o_orderkey + i*{mo} AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}, {rep}""")

write("lineitem", key="l_orderkey", sql=f"""
  SELECT l_orderkey + i*{mo} AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}, {rep}""")

write("events", key="event_id", sql=f"""
  SELECT event_id + i*{me} AS event_id, ts, user_id + i*{mu} AS user_id,
         event_type, value, props
  FROM {src('events')}, {rep}""")

mut_text = f"""CASE WHEN i = 0 THEN text ELSE
  array_to_string(list_transform(string_split(text, ' '), (w, j) ->
    CASE WHEN CAST(hash(doc_id * 1000003 + i * 7919 + j) % 20 AS BIGINT) = 0
         THEN 'v' || i || 'q' || CAST(hash(j * 31 + i) % 997 AS BIGINT)
         ELSE w END), ' ') END"""

write("documents", key="doc_id", sql=f"""
  SELECT doc_id + i*{md} AS doc_id, {mut_text} AS text, lang, source,
         CASE WHEN i = 0 THEN n_chars
              ELSE CAST(strlen({mut_text}) AS BIGINT) END AS n_chars
  FROM {src('documents')}, {rep}""")

write("embeddings", key="vec_id", sql=f"""
  SELECT vec_id + i*{mv} AS vec_id,
         CASE WHEN i = 0 THEN embedding ELSE
           list_transform(embedding, (x, j) -> CAST(x +
             (CAST(hash(vec_id * 131071 + i * 8191 + j) % 21 AS BIGINT) - 10)
             * 0.001 AS FLOAT)) END AS embedding,
         label
  FROM {src('embeddings')}, {rep}""")
