#!/usr/bin/env python3
"""Maintain tools/bench_floors.json — the per-query idle minima the
`sbt benchCheck` perf tripwire compares against (VERDICT r10 task 5).

Usage: tools/update_floors.py bench_queries.json [more.json ...]

For every query in the given Bench artifacts, the floor becomes the MIN
of the existing floor and the artifact's reported min — floors only ever
move DOWN (a faster verified run tightens the tripwire; a slow run never
loosens it). Queries flagged `contended` in an artifact are skipped for
that artifact. New queries enter at their first clean measurement.
"""
import json, sys

FLOORS = __file__.rsplit('/', 1)[0] + '/bench_floors.json'
try:
    floors = json.load(open(FLOORS))
except Exception:
    floors = {}

changed = 0
for path in sys.argv[1:]:
    art = json.load(open(path))
    contended = set(art.get('contended', []))
    for q, t in art.get('queries', {}).items():
        if q in contended:
            print(f'skip {q}: contended in {path}')
            continue
        old = floors.get(q)
        if old is None or t < old:
            floors[q] = round(float(t), 4)
            changed += 1

json.dump(floors, open(FLOORS, 'w'), indent=1, sort_keys=True)
print(f'{len(floors)} floors, {changed} updated -> {FLOORS}')
