#!/usr/bin/env python3
"""Dev-side mirror of the driver's correctness gate: run graft.Verify first,
then this script runs each oracle_sql.json query in DuckDB over the same
parquet tables and value-compares against the Spark dump.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, decimal
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
    orows = sorted((tuple(norm(v) for v in r) for r in odf[ocols].itertuples(index=False)), key=repr)
    srows = sorted((tuple(norm(v) for v in r) for r in sdf[scols].itertuples(index=False)), key=repr)
    if len(orows) != len(srows):
        print(f"FAIL {name}: row count spark={len(srows)} oracle={len(orows)}")
        fails += 1
    elif orows != srows:
        diff = [(a, b) for a, b in zip(srows, orows) if a != b]
        print(f"FAIL {name}: {len(diff)} differing rows; first: spark={diff[0][0]} oracle={diff[0][1]}")
        fails += 1
    else:
        print(f"OK   {name}: {len(srows)} rows")
print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
