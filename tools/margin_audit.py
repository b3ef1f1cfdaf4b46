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

# per-column grid attribution: `round(<expr>, d) AS name` binds grid
# 10^-d to output column `name`. (The stripped SQL emits the UNROUNDED
# expr under the same alias, shift constants included — so a shifted
# quantizer like round(power + 5.69e-4, 3) is audited on ITS 3dp grid of
# the SHIFTED value, not smeared onto an unrelated 6dp column's grid.)
def column_grids(sql):
    grids = {}
    for m in re.finditer(r'\bround\s*\(', sql, re.I):
        j = m.end() - 1
        depth = 0
        k = j
        while k < len(sql):
            if sql[k] == '(': depth += 1
            elif sql[k] == ')':
                depth -= 1
                if depth == 0: break
            k += 1
        inner = sql[j + 1:k]
        cpos = -1; d2 = 0
        for p, ch in enumerate(inner):
            if ch == '(': d2 += 1
            elif ch == ')': d2 -= 1
            elif ch == ',' and d2 == 0: cpos = p
        dm = re.fullmatch(r'\s*(\d+)\s*', inner[cpos + 1:]) if cpos >= 0 else None
        am = re.match(r'\s*AS\s+([A-Za-z_][A-Za-z0-9_]*)', sql[k + 1:], re.I)
        if dm and am and int(dm.group(1)) >= 2:
            grids[am.group(1).lower()] = 10.0 ** -int(dm.group(1))
    return grids

# --enforce taxonomy (PLANS_r9 §margin-audit), COLUMN-level:
#  * category-1 cross-ALGORITHM columns (FFT vs DFT spectra, gathered ACF,
#    Lomb) carry explicit bars derived from measured engine deviation —
#    the same bars BoundaryMarginSpec asserts Spark-side; a breach means
#    the shift constants must be re-scanned.
#  * every other (query, column) is judged against the checked-in
#    baseline (tools/margin_baseline.json, written with --rebaseline on a
#    verified-green tree): category-2 replays / category-3 exact landings
#    legitimately sit ON boundaries (baseline 0 → skip), and a column
#    whose margin COLLAPSES >10x below its recorded green-state margin to
#    under the default bar is exactly the "testdata regen / engine
#    upgrade reopened the q81/q86 flake class" signal.
#  * a (query, column) ABSENT from the baseline failing the default bar =
#    a new gate shipped with an unanalyzed tight margin.
CAT1_COL_BARS = {
    ('q48_periodogram_by_key', 'power'): 2.5e-7,  # 50 x 4.98e-9 FFT dev
    ('q81_periodogram_by_key_fft', 'power'): 2.5e-7,
    ('q76_periodogram_by_key_poly', 'power'): 2.2e-9,  # 50 x 4.4e-11
    ('q83_acf_by_key_fft', 'acf'): 1e-11,
    ('q84_pacf_by_key_fft', 'pacf'): 1e-11,
    ('q85_acf_confint_by_key', 'acf'): 1e-11,
    ('q85_acf_confint_by_key', 'ci_low'): 1e-11,
    ('q85_acf_confint_by_key', 'ci_high'): 1e-11,
    ('q49_lomb_by_key', 'power'): 1e-12,
}
enforce = '--enforce' in sys.argv
rebaseline = '--rebaseline' in sys.argv
baseline_path = __file__.rsplit('/', 1)[0] + '/margin_baseline.json'
try:
    baseline = json.load(open(baseline_path))
except Exception:
    baseline = {}

worst = []
violations = []
measured = {}
for name in sorted(oracle):
    sql = oracle[name]
    stripped, grids = strip_rounds(sql)
    if not grids:
        continue
    try:
        base_n = len(con.execute(sql).fetchall())
        rows = con.execute(stripped).fetchall()
        cols = [d[0].lower() for d in con.description]
        if len(rows) != base_n:
            print(f'SKIP {name}: stripped variant changed row count')
            continue
    except Exception as e:
        print(f'SKIP {name}: {str(e).splitlines()[0][:100]}')
        continue
    attributed = column_grids(sql)
    # columns with an attributed grid audit on it. The min-grid fallback
    # for UNattributed float columns only applies while some round() in
    # the query is itself unattributed (not immediately aliased / nested
    # in a larger expression) — then the conservative sweep must keep
    # covering whichever column that round feeds. Once every round() is
    # attributed, the remaining float columns are intentionally
    # unrounded (hashed-unrounded contract) and auditing them against
    # another column's grid raises spurious boundary violations
    # (ADVICE r11: an unrounded value near a half-grid of an unrelated
    # round()'s grid is not a flake risk).
    unattributed_rounds = len(grids) > len(attributed)
    col_grid = [attributed.get(c) or
                (min(grids) if unattributed_rounds else None)
                for c in cols]
    per = {}
    for r in rows:
        for c, v, g in zip(cols, r, col_grid):
            if g and isinstance(v, float) and not math.isnan(v) and not math.isinf(v):
                m = margin(v, g)
                if c not in per or m < per[c][0]:
                    per[c] = (m, v, g)
    if not per:
        continue
    mm, mv, mg = min(per.values())
    print(f'{name}: grid {mg:g} min_margin {mm:.3e} at value {mv!r}')
    worst.append((mm, name))
    for c, (m, v, g) in per.items():
        measured[f'{name}.{c}'] = m
        key = (name, c)
        if key in CAT1_COL_BARS:
            if m < CAT1_COL_BARS[key]:
                violations.append((name, c, m,
                    f'cat-1 bar {CAT1_COL_BARS[key]:.1e} — re-scan shift'))
        elif m < bar:
            b = baseline.get(f'{name}.{c}')
            if b is None:
                violations.append((name, c, m,
                    f'default bar {bar:.1e}, no baseline — new unanalyzed gate?'))
            elif b > 0 and m < b / 10:
                violations.append((name, c, m,
                    f'collapsed >10x below green baseline {b:.1e}'))

worst.sort()
print('\n5 tightest:', [(n, f'{m:.2e}') for m, n in worst[:5]])
if rebaseline:
    json.dump(measured, open(baseline_path, 'w'), indent=1, sort_keys=True)
    print(f'rebaselined {len(measured)} columns -> {baseline_path}')
elif enforce:
    if violations:
        for n, c, m, why in violations:
            print(f'VIOLATION {n}.{c}: min_margin {m:.3e} ({why})')
        sys.exit(1)
    print('ENFORCE: all margins clear their bars')
