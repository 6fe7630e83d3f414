#!/usr/bin/env python3
"""Generate an sf1-scale stress corpus at /tmp/sf1 by 10x-replicating
the read-only /root/testdata/sf0.1 tables with key shifting (driver-side
tooling only — the engine never depends on this script).

Replication semantics (stress-shape fidelity, not oracle correctness):
  - fact tables (lineitem, orders, events) shift their primary keys per
    replica so joins keep realistic key cardinalities; foreign keys into
    the unscaled dims stay, so per-dim fan-out grows 10x (the harsher
    direction for the join/agg plans under test);
  - documents get per-replica WORD salting (every token suffixed with
    the replica id) so replicas share no vocabulary: the within-replica
    duplicate structure is preserved and the near-dup pair count scales
    linearly (a plain text suffix made every replica a >0.9-Jaccard
    near-dup of its 9 siblings — pair count grew ~100x, not 10x);
  - embeddings get a tiny per-replica perturbation so ANN candidates
    scale instead of degenerating into identical vectors;
  - dims (region, nation, customer, supplier, part) copy as-is.
"""
import duckdb, os, sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
REPS = 10
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def gen(table, select_per_rep):
    parts = [select_per_rep(r) for r in range(REPS)]
    q = " UNION ALL ".join(parts)
    con.sql(f"COPY ({q}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")

def copy(table):
    con.sql(f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) "
            f"TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    print(f"{table}: copied")

KO = 10_000_000   # > max o_orderkey at sf0.1
KE = 10_000_000   # > max event_id
KD = 1_000_000    # > max doc_id
KV = 1_000_000    # > max vec_id

for t in ["region", "nation", "customer", "supplier", "part"]:
    copy(t)

gen("orders", lambda r: (
    f"SELECT o_orderkey + {r*KO} AS o_orderkey, o_custkey, o_orderstatus, "
    f"o_totalprice, o_orderdate, o_orderpriority "
    f"FROM read_parquet('{SRC}/orders.parquet')"))

gen("lineitem", lambda r: (
    f"SELECT l_orderkey + {r*KO} AS l_orderkey, l_partkey, l_suppkey, "
    f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
    f"l_returnflag, l_linestatus, l_shipdate "
    f"FROM read_parquet('{SRC}/lineitem.parquet')"))

gen("events", lambda r: (
    f"SELECT event_id + {r*KE} AS event_id, ts, user_id, event_type, "
    f"\"value\", props FROM read_parquet('{SRC}/events.parquet')"))

gen("documents", lambda r: (
    f"SELECT doc_id + {r*KD} AS doc_id, "
    + ("text" if r == 0 else
       f"array_to_string(list_transform(string_split(text, ' '), w -> w || 'z{r}'), ' ')")
    + " AS text, "
    f"lang, source, n_chars FROM read_parquet('{SRC}/documents.parquet')"))

gen("embeddings", lambda r: (
    f"SELECT vec_id + {r*KV} AS vec_id, "
    + ("embedding" if r == 0 else
       f"list_transform(embedding, x -> CAST(x + {r} * 1e-4 AS FLOAT)) AS embedding")
    + f", label FROM read_parquet('{SRC}/embeddings.parquet')"))
print("done ->", DST)
