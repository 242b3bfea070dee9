#!/usr/bin/env python3
"""Independent llm_pipeline_e2e validation at scale factors where the
declared recursive-CTE oracle is impractical (same reason as
llm_dedup_clusters: the UNION-dedup walk enumerates (node,
reachable-label) pairs, unbounded on sf0.1's dup-heavy graph).

Method: recompute the funnel with DuckDB for the closed-form stages
(raw / quality / repetition / exact-dedup / mixture gate) and a
python union-find over the brute-force tau=0.95 pair graph of the
stage-3 survivors for the near-dedup stage — the same pair predicate
the declared oracle uses — then compare all six (n_docs,
n_toks_total) funnel rows against the Verify output parquet.

Usage: tools/e2e_check.py [sfdir] [verify_outdir]
"""
import glob
import sys

import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify_sf0.1"

thr = " ".join(
    f"WHEN 'src{i}' THEN '{int(min(1.0, 0.2 + 0.04 * i) * 65536):04x}'"
    for i in range(20))

con = duckdb.connect()
con.execute(f"""CREATE VIEW documents AS
  SELECT * FROM read_parquet('{sfdir}/documents.parquet')""")

# closed-form stages (no recursion): one row per doc with flags f1..f3
con.execute(f"""CREATE TABLE flags AS
WITH raw AS (SELECT doc_id, text, source,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_toks FROM documents),
tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM raw),
u AS (SELECT doc_id, count(*) AS c
      FROM (SELECT doc_id, unnest(tk) AS tok FROM tk) GROUP BY doc_id, tok),
um AS (SELECT doc_id, max(c) AS mx FROM u GROUP BY doc_id),
bg AS (SELECT doc_id, count(*) AS c
      FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1),
              i -> tk[i] || ' ' || tk[i + 1])) AS g FROM tk) GROUP BY doc_id, g),
bm AS (SELECT doc_id, max(c) AS mx FROM bg GROUP BY doc_id),
rk AS (SELECT um.doc_id FROM um JOIN tk ON um.doc_id = tk.doc_id
       LEFT JOIN bm ON um.doc_id = bm.doc_id
       WHERE CAST(um.mx AS DOUBLE) / len(tk.tk) < 0.12
         AND CAST(coalesce(bm.mx, 0) AS DOUBLE) / greatest(len(tk.tk) - 1, 1) < 0.06)
SELECT r.doc_id, r.text, r.source, r.n_toks,
  r.n_toks >= 20 AS f1,
  r.n_toks >= 20 AND rk.doc_id IS NOT NULL AS f2,
  substring(md5(CAST(r.doc_id AS VARCHAR)), 1, 4) < (CASE r.source {thr} ELSE '0000' END) AS gate
FROM raw r LEFT JOIN rk ON r.doc_id = rk.doc_id""")

con.execute("""CREATE TABLE s2 AS
WITH ex AS (SELECT min(doc_id) AS doc_id FROM flags WHERE f2
            GROUP BY sha256(lower(trim(text))))
SELECT flags.* FROM flags JOIN ex USING (doc_id)""")

pairs = con.execute("""
WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM s2)
SELECT x.doc_id, y.doc_id FROM t x JOIN t y ON x.doc_id < y.doc_id
WHERE CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE)
      / len(list_distinct(list_concat(x.toks, y.toks))) >= 0.95""").fetchall()
s2_ids = [r[0] for r in con.execute("SELECT doc_id FROM s2").fetchall()]

parent = {d: d for d in s2_ids}
def find(x):
    while parent[x] != x:
        parent[x] = parent[parent[x]]
        x = parent[x]
    return x
for a, b in pairs:
    ra, rb = find(a), find(b)
    if ra != rb:
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra
reps = {d for d in s2_ids if find(d) == d}

rows = con.execute("SELECT doc_id, n_toks, f1, f2, gate FROM flags").fetchall()
s2set = set(s2_ids)
funnel = []
for stage, name, pred in [
    (0, "raw", lambda r: True),
    (1, "quality", lambda r: r[2]),
    (2, "repetition", lambda r: r[3]),
    (3, "exact_dedup", lambda r: r[0] in s2set),
    (4, "near_dedup", lambda r: r[0] in reps),
    (5, "mixture_sample", lambda r: r[0] in reps and r[4]),
]:
    sel = [r for r in rows if pred(r)]
    funnel.append((stage, name, len(sel), sum(r[1] for r in sel)))

got = con.execute(
    f"""SELECT stage, name, n_docs, n_toks_total
        FROM read_parquet({glob.glob(f'{outdir}/llm_pipeline_e2e/*.parquet')!r})
        ORDER BY stage""").fetchall()
want = [(s, n, d, t) for (s, n, d, t) in funnel]
mismatches = [(g, w) for g, w in zip(got, want) if tuple(g) != w]
print(f"docs={len(rows)} pairs={len(pairs)} reps={len(reps)}")
for g, w in zip(got, want):
    print(f"  stage {g[0]} {g[1]:<15} engine=({g[2]}, {g[3]})  check=({w[2]}, {w[3]})")
print(f"mismatches={len(mismatches)}")
sys.exit(1 if mismatches or len(got) != 6 else 0)
