"""Generate a local 10x replica of /root/testdata/sf0.1 at /tmp/sf1 for
the round-6 scale spot-check (VERDICT r5 #4): prove the heavy registry
entries scale ~linearly between sf0.1 and sf1 on the SAME machine.

Replication is KEY-SHIFTED and CONTENT-PERTURBED, not naive row
duplication — naive copies would create 10-way exact-duplicate groups
that quadratically inflate every near-dup candidate join and collapse
the graph entries' edge sets, measuring a different workload instead of
a bigger one:
  * fact keys (doc_id, vec_id, event_id, user_id, orderkey, suppkey,
    custkey) shift by a replica offset -> 10 disjoint key spaces
    (disjoint subgraphs for PageRank/HITS/triangles, 10x distinct users
    for EWMA/sessionize);
  * document text rotates by a replica-dependent offset -> different
    shingles/chunks per replica (MinHash, winnowing, CDC see 10x
    distinct content);
  * embeddings rotate component order per replica -> no cross-replica
    exact-duplicate vectors for cosine/SemDeDup/LSH.
Dimension tables copy verbatim. Deterministic: no RNG anywhere.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def gen(table: str, select_for_replica):
    parts = " UNION ALL ".join(select_for_replica(r) for r in range(REPLICAS))
    con.execute(
        f"COPY ({parts}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
    )
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

D = 10_000_000

gen("documents", lambda r: f"""
    SELECT doc_id + {r * D} AS doc_id,
           substr(text, 1 + ({r * 37}) % greatest(n_chars, 1))
             || substr(text, 1, ({r * 37}) % greatest(n_chars, 1)) AS text,
           lang, source, n_chars
    FROM '{SRC}/documents.parquet'""")

gen("embeddings", lambda r: f"""
    SELECT vec_id + {r * D} AS vec_id,
           CAST(list_concat(embedding[{r + 1}:], embedding[1:{r}]) AS FLOAT[])
             AS embedding,
           label
    FROM '{SRC}/embeddings.parquet'""")

gen("events", lambda r: f"""
    SELECT event_id + {r * D} AS event_id, ts,
           user_id + {r * D} AS user_id, event_type, value, props
    FROM '{SRC}/events.parquet'""")

gen("orders", lambda r: f"""
    SELECT o_orderkey + {r * D * 10} AS o_orderkey,
           o_custkey + {r * D} AS o_custkey,
           o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM '{SRC}/orders.parquet'""")

gen("lineitem", lambda r: f"""
    SELECT l_orderkey + {r * D * 10} AS l_orderkey,
           l_partkey,
           l_suppkey + {r * D} AS l_suppkey,
           l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
           l_returnflag, l_linestatus, l_shipdate
    FROM '{SRC}/lineitem.parquet'""")

for dim in ("region", "nation", "customer", "supplier", "part"):
    shutil.copyfile(f"{SRC}/{dim}.parquet", f"{DST}/{dim}.parquet")
    print(f"{dim}: copied")
