#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB against the same sfDir tables,
sort columns by name, and compare values exactly (strict) and with row-order
insensitivity (lenient) so we can see which discipline holds.
"""
import json, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    qdir = f"{outdir}/{name}"
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"MISSING  {name}: no spark output"); fails += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_df()
        exp = con.execute(sql).fetch_df()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fails += 1; continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"SCHEMA   {name}: spark={gcols} oracle={ecols}"); fails += 1; continue
    g, e = got[gcols], exp[ecols]
    if len(g) != len(e):
        print(f"ROWCOUNT {name}: spark={len(g)} oracle={len(e)}"); fails += 1; continue
    strict = g.reset_index(drop=True).equals(e.reset_index(drop=True))
    gs = g.sort_values(gcols).reset_index(drop=True)
    es = e.sort_values(ecols).reset_index(drop=True)
    lenient = gs.equals(es)
    if strict:
        print(f"OK       {name} ({len(g)} rows)")
    elif lenient:
        print(f"ORDER    {name}: values match, row order differs"); fails += 1
    else:
        diff = (gs != es) & ~(gs.isna() & es.isna())
        bad = diff.any(axis=1)
        if bad.sum() == 0:
            print(f"DTYPE    {name}: values equal but dtypes differ: "
                  f"spark={dict(gs.dtypes.astype(str))} "
                  f"oracle={dict(es.dtypes.astype(str))}")
        else:
            print(f"VALUES   {name}: {bad.sum()}/{len(gs)} rows differ")
            print("  spark:", gs[bad].head(3).to_dict("records"))
            print("  oracle:", es[bad].head(3).to_dict("records"))
        fails += 1
print(f"\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
