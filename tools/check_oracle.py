#!/usr/bin/env python3
"""Dev-side mirror of the driver's correctness gate: run graft.Verify first,
then this script runs each oracle_sql.json query in DuckDB over the same
parquet tables and value-compares against the Spark dump.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, decimal
from collections import Counter
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = f.split("/")[-1].removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v.hex())
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def tol_eq(a, b, rel=1e-9):
    """Tolerant scalar compare: floats within rel tolerance, else exact."""
    if isinstance(a, tuple) and isinstance(b, tuple):
        if a and b and a[0] == "f" == b[0] and a[1] != "nan" and b[1] != "nan":
            x, y = float.fromhex(a[1]), float.fromhex(b[1])
            return math.isclose(x, y, rel_tol=rel, abs_tol=1e-12)
        return len(a) == len(b) and all(tol_eq(x, y) for x, y in zip(a, b))
    return a == b

def is_near(only_s, only_o):
    """True iff the two leftover row multisets pair up 1:1 within float
    tolerance — i.e. the only differences are sub-ulp double drift."""
    if len(only_s) != len(only_o):
        return False
    pool = list(only_o)
    for r in only_s:
        m = next((i for i, o in enumerate(pool) if tol_eq(r, o)), None)
        if m is None:
            return False
        pool.pop(m)
    return True

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    sdf = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        print(f"FAIL {name}: columns differ: spark={scols} oracle={ocols}")
        fails += 1
        continue
    orows = Counter(tuple(norm(v) for v in r) for r in odf[ocols].itertuples(index=False))
    srows = Counter(tuple(norm(v) for v in r) for r in sdf[scols].itertuples(index=False))
    if len(list(orows.elements())) != len(list(srows.elements())):
        print(f"FAIL {name}: row count spark={sum(srows.values())} oracle={sum(orows.values())}")
        fails += 1
    elif orows != srows:
        # Multiset diff: rows only on one side — never pairs unrelated rows.
        only_s = list((srows - orows).elements())
        only_o = list((orows - srows).elements())
        near = is_near(only_s, only_o)
        tag = " (float-ulp only — driver hash will still fail)" if near else ""
        print(f"FAIL {name}: {len(only_s)} spark-only / {len(only_o)} oracle-only rows{tag};")
        print(f"     first spark-only:  {only_s[0] if only_s else None}")
        print(f"     first oracle-only: {only_o[0] if only_o else None}")
        fails += 1
    else:
        print(f"OK   {name}: {sum(srows.values())} rows")
print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
