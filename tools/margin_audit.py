#!/usr/bin/env python3
"""Boundary-margin audit across every gate oracle: strip the final-digit
round(x, d) quantizers (d >= 2 — semantic cents rounds carry no digit arg
or d < 2) from each oracle SQL, re-run it in DuckDB, and measure every
float value's distance to its original 10^-d grid's HALF_UP boundaries.
A value within ~1e-9 of a boundary is one engine-build away from a hash
flip (the q81/q86 class). Diagnostic only — prints per-query min margins,
flags anything under the bar.

Caveat: stripping a round() that feeds LOGIC (ranking, thresholds)
changes semantics; queries whose stripped variant errors or changes row
count are reported as SKIP and must be audited by hand.
"""
import sys, json, math, re
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_sf01'
bar = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-9

con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def strip_rounds(sql):
    """Replace round(EXPR, d) [d>=2] with (EXPR); return (sql, grids) where
    grids maps the order-of-appearance index to 10^-d."""
    out = []
    grids = []
    i = 0
    low = sql.lower()
    while True:
        j = low.find('round(', i)
        if j < 0:
            out.append(sql[i:])
            break
        # find the matching close paren
        depth = 0
        k = j + 5  # at '('
        while k < len(sql):
            if sql[k] == '(':
                depth += 1
            elif sql[k] == ')':
                depth -= 1
                if depth == 0:
                    break
            k += 1
        inner = sql[j + 6:k]
        # split at the top-level last comma: round(expr, d)
        depth2 = 0
        cpos = -1
        for p, ch in enumerate(inner):
            if ch == '(':
                depth2 += 1
            elif ch == ')':
                depth2 -= 1
            elif ch == ',' and depth2 == 0:
                cpos = p
        m = re.fullmatch(r'\s*(\d+)\s*', inner[cpos + 1:]) if cpos >= 0 else None
        if m and int(m.group(1)) >= 2:
            out.append(sql[i:j])
            out.append('(' + inner[:cpos] + ')')
            grids.append(10.0 ** -int(m.group(1)))
        else:
            out.append(sql[i:k + 1])
        i = k + 1
    return ''.join(out), grids

def margin(v, grid):
    f = (abs(v) / grid) % 1.0
    return abs(f - 0.5) * grid

worst = []
for name in sorted(oracle):
    sql = oracle[name]
    stripped, grids = strip_rounds(sql)
    if not grids:
        continue
    try:
        base_n = len(con.execute(sql).fetchall())
        rows = con.execute(stripped).fetchall()
        cols = [d[0] for d in con.description]
        if len(rows) != base_n:
            print(f'SKIP {name}: stripped variant changed row count')
            continue
    except Exception as e:
        print(f'SKIP {name}: {str(e).splitlines()[0][:100]}')
        continue
    # conservatively test every float column against the FINEST stripped
    # grid (per-column grid attribution is not tracked)
    grid = min(grids)
    mm = None
    mv = None
    for r in rows:
        for v in r:
            if isinstance(v, float) and not math.isnan(v) and not math.isinf(v):
                m = margin(v, grid)
                if mm is None or m < mm:
                    mm, mv = m, v
    if mm is not None:
        flag = '  <-- TIGHT' if mm < bar else ''
        print(f'{name}: grid {grid:g} min_margin {mm:.3e} at value {mv!r}{flag}')
        worst.append((mm, name))

worst.sort()
print('\n5 tightest:', [(n, f'{m:.2e}') for m, n in worst[:5]])
