#!/usr/bin/env python3
"""Independent llm_dedup_clusters validation at scale factors where the
declared recursive-CTE oracle is impractical (DuckDB's UNION-dedup walk
enumerates (node, reachable-label) pairs — fine at sf0.01, effectively
unbounded on sf0.1's 190k-pair graph).

Method: brute-force tau=0.95 token-set Jaccard pairs in DuckDB (the
same pair predicate the declared oracle uses), then union-find in
Python, compared against the Verify output parquet row-for-row.

Usage: tools/cc_check.py [sfdir] [verify_outdir]
  (defaults: /root/testdata/sf0.1 /tmp/graft_verify_sf0.1 — run
   tools/check.sh sf0.1 first to produce the Verify output)

Last validated r7: sf0.1 -> docs=5000 pairs=190925 components=2822,
0 mismatches.
"""
import duckdb, glob, sys

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify_sf0.1"

con = duckdb.connect()
pairs = con.execute(f"""
WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
           FROM read_parquet('{sfdir}/documents.parquet')),
p AS (SELECT x.doc_id AS a, y.doc_id AS b
      FROM t x JOIN t y ON x.doc_id < y.doc_id
      WHERE CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE)
            / len(list_distinct(list_concat(x.toks, y.toks))) >= 0.95)
SELECT a, b FROM p""").fetchall()
docs = [r[0] for r in con.execute(
    f"SELECT doc_id FROM read_parquet('{sfdir}/documents.parquet')").fetchall()]

parent = {d: d for d in docs}
def find(x):
    while parent[x] != x:
        parent[x] = parent[parent[x]]
        x = parent[x]
    return x
for a, b in pairs:
    ra, rb = find(a), find(b)
    if ra != rb:
        parent[max(ra, rb)] = min(ra, rb)
expected = {d: find(d) for d in docs}

files = sorted(glob.glob(f"{outdir}/llm_dedup_clusters/*.parquet"))
rows = con.execute(
    f"SELECT doc_id, rep FROM read_parquet({files!r})").fetchall()
got = dict(rows)
# exact key-set + cardinality check: extra rows, missing docs, and
# conflicting duplicate doc_ids must all fail, not pass silently
bad_shape = len(rows) != len(docs) or set(got) != set(docs)
mismatch = [d for d in docs if expected[d] != got.get(d)]
print(f"docs={len(docs)} pairs={len(pairs)} "
      f"components={len(set(expected.values()))} "
      f"rows={len(rows)} mismatches={len(mismatch)}")
ok = not mismatch and not bad_shape
print("CLUSTERS", "OK" if ok else
      f"FAIL shape_ok={not bad_shape} {mismatch[:10]}")
sys.exit(0 if ok else 1)
