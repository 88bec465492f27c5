#!/usr/bin/env python3
"""Synthesize an N-replica scale-up of the sf0.1 fixtures for local
scaling rehearsals (SCALING.md's measured-exponent table).

Replication is designed so each quadratic-risk tier scales the way a
real corpus would:
- documents: ids offset per replica; every WORD gets a replica-unique
  LETTER suffix (the tokenizer splits on non-letters, so a digit
  suffix would collide across replicas), keeping replica vocabularies
  disjoint — shingle/minhash buckets grow linearly, within-replica
  duplicate structure is preserved exactly.
- embeddings: ids offset; dim 0 nudged by k/1000 so replicas are
  near but not identical in embedding space.
- events: event/user ids offset, TIMESTAMPS UNCHANGED — per-(hour,
  type) slot occupancy grows by the replica factor, which is exactly
  the hot-bucket stress the co-presence cap exists for.

Usage: python3 scripts/make_scale.py [src] [dst] [replicas]
"""
import duckdb, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "target/scale10"
k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW r AS SELECT UNNEST(range(0, {k})) AS k")

# The replica key offset is a fixed 1e7; if any base key (or the numeric
# name suffix the record-linkage blocking key reads) reaches 1e7 the
# replicas would collide in key space / suffix space and silently
# cross-link. Guard it explicitly rather than relying on sf0.1 staying
# small.
OFFSET = 10_000_000
for t, key in [("documents", "doc_id"), ("embeddings", "vec_id"),
               ("customer", "c_custkey"), ("supplier", "s_suppkey")]:
    mx = con.execute(
        f"SELECT MAX({key}) FROM read_parquet('{src}/{t}.parquet')"
    ).fetchone()[0]
    assert mx < OFFSET, (
        f"{t}.{key} max={mx} >= replica offset {OFFSET}; replicas would "
        f"collide — raise OFFSET past the observed max")
mx = con.execute(
    f"SELECT MAX(GREATEST(event_id, user_id)) "
    f"FROM read_parquet('{src}/events.parquet')").fetchone()[0]
assert mx < OFFSET, f"events key max={mx} >= replica offset {OFFSET}"
for t, col in [("customer", "c_name"), ("supplier", "s_name")]:
    mx = con.execute(
        f"SELECT MAX(CAST(regexp_extract({col}, '([0-9]+)$', 1) AS BIGINT)) "
        f"FROM read_parquet('{src}/{t}.parquet')").fetchone()[0]
    assert mx < OFFSET, (
        f"{t}.{col} numeric suffix max={mx} >= replica offset {OFFSET}; "
        f"blocking suffixes would collide across replicas")

con.execute(f"""
COPY (
  SELECT doc_id + r.k * 10000000 AS doc_id,
         -- TWO-letter suffix: chr(97+k) alone walks past 'z' at k>=26
         -- into NON-letters, which the tokenizer strips -- replicas
         -- 26+ then share vocabulary and become cross-replica
         -- near-dups (observed: 30x build produced 40.6x candidate
         -- pairs). Two letters stay within \\p{{L}} for k < 676.
         regexp_replace(text, '(\\p{{L}}+)',
           '\\1zz' || chr(97 + CAST(r.k AS INT) // 26)
                   || chr(97 + CAST(r.k AS INT) % 26), 'g') AS text,
         lang, source, n_chars
  FROM read_parquet('{src}/documents.parquet'), r
) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (
  SELECT vec_id + r.k * 10000000 AS vec_id,
         list_concat(
           [CAST(embedding[1] + CAST(r.k AS FLOAT) / 1000.0 AS FLOAT)],
           embedding[2:]) AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet'), r
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (
  SELECT event_id + r.k * 10000000 AS event_id, ts,
         user_id + r.k * 10000000 AS user_id, event_type, value, props
  FROM read_parquet('{src}/events.parquet'), r
) TO '{dst}/events.parquet' (FORMAT PARQUET)""")

# customer/supplier: keys offset per replica and the numeric NAME
# suffix offset identically, so the record-linkage blocking key
# (digits at the end of the name) stays aligned with the new keys —
# replica registries link within themselves, never across replicas,
# which is how a real 10x-bigger registry behaves (more blocks, same
# per-block occupancy).
# the new numeric suffix is zero-padded back to at least the source
# suffix width, so replica 0 stays byte-identical to the 1x registry
# (CAST alone would strip the padding); the qualified t.* EXCLUDE
# keeps the replica index k out of the output schema (a bare
# * EXCLUDE would expand over the joined view r and leak k)
con.execute(f"""
COPY (
  SELECT t.c_custkey + r.k * 10000000 AS c_custkey,
         regexp_replace(t.c_name, '([0-9]+)$',
           lpad(CAST(CAST(regexp_extract(t.c_name, '([0-9]+)$', 1) AS BIGINT)
                     + r.k * 10000000 AS VARCHAR),
                CAST(GREATEST(length(regexp_extract(t.c_name, '([0-9]+)$', 1)),
                  length(CAST(CAST(regexp_extract(t.c_name, '([0-9]+)$', 1)
                    AS BIGINT) + r.k * 10000000 AS VARCHAR))) AS INTEGER),
                '0')) AS c_name,
         t.c_nationkey,
         t.* EXCLUDE (c_custkey, c_name, c_nationkey)
  FROM read_parquet('{src}/customer.parquet') t, r
) TO '{dst}/customer.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (
  SELECT t.s_suppkey + r.k * 10000000 AS s_suppkey,
         regexp_replace(t.s_name, '([0-9]+)$',
           lpad(CAST(CAST(regexp_extract(t.s_name, '([0-9]+)$', 1) AS BIGINT)
                     + r.k * 10000000 AS VARCHAR),
                CAST(GREATEST(length(regexp_extract(t.s_name, '([0-9]+)$', 1)),
                  length(CAST(CAST(regexp_extract(t.s_name, '([0-9]+)$', 1)
                    AS BIGINT) + r.k * 10000000 AS VARCHAR))) AS INTEGER),
                '0')) AS s_name,
         t.s_nationkey,
         t.* EXCLUDE (s_suppkey, s_name, s_nationkey)
  FROM read_parquet('{src}/supplier.parquet') t, r
) TO '{dst}/supplier.parquet' (FORMAT PARQUET)""")

for t in ["documents", "embeddings", "events", "customer", "supplier"]:
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")
