#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (SURVEY.md §5.2).

Usage: parity.py <sfDir> <verifyOutDir> [keyFilter...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over views
of the base tables in <sfDir>, and compares:
  - row count
  - schema (column names sorted; types)
  - every value, in result order, columns sorted by name
Exit code 1 if any declared query mismatches.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    # Align representations across parquet-read vs query-result paths.
    import decimal, datetime, math
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, norm(x)) for k, x in sorted(v.items()))
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return v.replace(tzinfo=None)
    return v

def drv_repr_mismatch(files, con, sql):
    """Emulate the driver's hash: our parquet via pyarrow->pandas
    (native types: Decimal objects, datetime.date, tz-aware ts, numpy
    arrays), the oracle via DuckDB's pandas path, then compare str()
    of every value with columns sorted by name. Returns a description
    of the first mismatching cell, or None. This is what caught the
    round-2 DECIMAL('x.00') vs float 'x.0' failure."""
    import pyarrow.parquet as pq
    import pandas as pd
    mine = pd.concat([pq.read_table(f).to_pandas() for f in files],
                     ignore_index=True)
    theirs = con.execute(sql).df()
    mine = mine[sorted(mine.columns)]
    theirs = theirs[sorted(theirs.columns)]
    if list(mine.columns) != list(theirs.columns) or len(mine) != len(theirs):
        return "shape/columns differ"
    for c in mine.columns:
        a = [str(v) for v in mine[c].tolist()]
        b = [str(v) for v in theirs[c].tolist()]
        if a != b:
            i = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            return f"col {c} row {i}: mine={a[i]!r} oracle={b[i]!r}"
    return None

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    try:  # written by graft.Verify: key -> first line of the exception
        verr = json.load(open(f"{outdir}/verify_errors.json"))
    except Exception:
        verr = {}
    n_pass = n_fail = 0
    fails = []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            why = f"crashed in Verify: {verr[name]}" if name in verr else "no result parquet"
            print(f"FAIL {name}: {why}"); n_fail += 1; fails.append(name); continue
        try:
            mine = con.execute(f"SELECT * FROM read_parquet({files!r})")
            mcols = [d[0] for d in mine.description]
            mrows = mine.fetchall()
            theirs = con.execute(sql)
            ocols = [d[0] for d in theirs.description]
            orows = theirs.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e).splitlines()[0]}"); n_fail += 1; fails.append(name); continue
        msort = sorted(range(len(mcols)), key=lambda i: mcols[i])
        osort = sorted(range(len(ocols)), key=lambda i: ocols[i])
        if sorted(mcols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(mcols)} vs {sorted(ocols)}"); n_fail += 1; fails.append(name); continue
        if len(mrows) != len(orows):
            print(f"FAIL {name}: rows {len(mrows)} vs {len(orows)}"); n_fail += 1; fails.append(name); continue
        bad = None
        for ri, (mr, orow) in enumerate(zip(mrows, orows)):
            mv = tuple(norm(mr[i]) for i in msort)
            ov = tuple(norm(orow[i]) for i in osort)
            if mv != ov:
                bad = (ri, mv, ov); break
        if bad:
            ri, mv, ov = bad
            print(f"FAIL {name}: row {ri} differs")
            for ci, (a, b) in enumerate(zip(mv, ov)):
                if a != b:
                    print(f"   col {sorted(mcols)[ci]}: mine={a!r} oracle={b!r}")
            n_fail += 1; fails.append(name); continue
        try:
            rep = drv_repr_mismatch(files, con, sql)
        except Exception as e:
            rep = f"repr-check error: {str(e).splitlines()[0]}"
        if rep:
            print(f"FAIL {name}: values equal but driver-repr differs: {rep}")
            n_fail += 1; fails.append(name); continue
        n_pass += 1
        print(f"ok   {name} ({len(mrows)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed" + (f": {fails}" if fails else ""))
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
