#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet, compare (schema-insensitively: columns
sorted by name, rows sorted, values stringified with float rounding) against
the Spark parquet dumps produced by graft.Verify."""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
# optional third arg: comma-separated query names to EXEMPT (reported as
# EXEMPT, never counted as failures). Used by `sbt gateSweep` at sf0.001,
# where the per-SF golden-VALUES oracles (q31/q32/q33/q127) legitimately
# match no golden tag and return 0 rows.
exempt = set(sys.argv[3].split(',')) if len(sys.argv) > 3 and sys.argv[3] else set()
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return 'NaN'
        return f'{v:.9g}'
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

fails = 0
for name in sorted(oracle):
    if name in exempt:
        print(f'EXMP {name}: exempt at this SF (per-SF golden oracle)')
        continue
    try:
        # fetch via pandas (as the driver does): DuckDB HUGEINT becomes
        # float64 here, so int-vs-float type drift is caught locally
        odf = con.execute(oracle[name]).df()
        ocols = list(odf.columns)
        orows = [tuple(r) for r in odf.itertuples(index=False)]
        sdf = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        scols = list(sdf.columns)
        srows = [tuple(r) for r in sdf.itertuples(index=False)]
        oc, orw = canon(ocols, orows)
        sc, srw = canon(scols, srows)
        if oc != sc:
            print(f'FAIL {name}: schema oracle={oc} spark={sc}'); fails += 1
        elif len(orw) != len(srw):
            print(f'FAIL {name}: rows oracle={len(orw)} spark={len(srw)}'); fails += 1
        elif orw != srw:
            diff = [(a, b) for a, b in zip(orw, srw) if a != b][:3]
            print(f'FAIL {name}: values differ, first diffs: {diff}'); fails += 1
        else:
            print(f'OK   {name} ({len(srw)} rows)')
    except Exception as e:
        print(f'ERR  {name}: {e}'); fails += 1
# rows-only queries (no oracle)
for d in sorted(glob.glob(f'{outdir}/q*')):
    name = d.split('/')[-1]
    if name not in oracle:
        n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
        print(f'ROWS {name}: {n} rows (no oracle)')
sys.exit(1 if fails else 0)
