#!/usr/bin/env python3
"""Mechanical slow-host adjudication for benchCheck (VERDICT r13 task 3).

Rounds 11-13 each ended with a benchCheck red that a human then
adjudicated in prose as host weather (uniformly elevated CPU sentinel,
zero GC, violations smeared across unrelated query families). The
harness already records everything that adjudication used; this tool IS
the decision rule, so the verdict is reproducible from the transcript
instead of re-argued per round.

Input: one JSON file written by the benchCheck sbt task when a
regression is confirmed:

  {
    "bar": 1.5,
    "floor_sentinel": 0.0093,          # tools/bench_floors.json _floor_sentinel_ref
    "pass_sentinels": [0.0111, ...],   # sentinel_ref of every executed pass
    "confirmed": [{"q": "...", "t": 0.308, "floor": 0.193}, ...],
    "overbar_any": ["q..."],           # over bar in ANY contention-clean pass
    "dispersion_files": ["/tmp/benchcheck_pass1/bench_dispersion.json", ...]
  }

Decision rule (all three must hold for the advisory verdict):
  1. SLOW HOST: every executed pass's machine-speed ratio
     (pass sentinel_ref / floor-era sentinel_ref) >= 1.15 - the host
     never reached floor-era speed, so floor-relative bars are
     structurally inflated. Missing sentinel data fails this clause
     (no provenance -> no advisory).
  2. NOT GC: every confirmed query's gc_ms (max across the per-pass
     dispersion artifacts) <= 50 ms, OR its GC-discounted time
     (t - gc_ms) clears the bar - a pause-inflated min on an
     otherwise-weather-consistent host is a measurement artifact
     (the pause EXPLAINS the overage), while a genuine JVM-pause /
     memory regression stays red because even its GC-free time is
     over bar (r14: q30 confirmed at 1.51x with 158 ms of GC in the
     min block; discounted 1.33x - the gate must not hand-adjudicate
     that).
  3. BROAD: the queries over bar in any clean pass span >= 3 distinct
     name-derived families (the token after the qNN_ prefix) - broad
     smear across unrelated code paths is weather's signature; a
     single hot family is exactly what a real regression looks like.

Exit 0 + "OVER-BAR/SLOW-HOST (advisory)" when all hold; exit 2 +
"REGRESSION" otherwise. The caller treats 0 as a loudly-annotated green
and anything else as the historical red.
"""
import json
import re
import sys

MIN_RATIO = 1.15
MAX_GC_MS = 50
MIN_FAMILIES = 3


def family(qname):
    """q45_var_forecast_fixed -> 'var'; q28_periodogram -> 'periodogram'."""
    m = re.match(r"q\d+_([a-z0-9]+)", qname)
    return m.group(1) if m else qname


def main(path):
    ev = json.load(open(path))
    confirmed = ev.get("confirmed", [])
    if not confirmed:
        print("weather_verdict: no confirmed violations - nothing to adjudicate")
        return 0

    reasons, ok = [], True

    floor_s = ev.get("floor_sentinel")
    sentinels = [s for s in ev.get("pass_sentinels", []) if s]
    if floor_s and sentinels:
        ratios = [s / floor_s for s in sentinels]
        worst = min(ratios)
        line = "machine speed: pass ratios %s vs floor era (min %.2fx)" % (
            ["%.2f" % r for r in ratios], worst)
        if worst >= MIN_RATIO:
            reasons.append("SLOW HOST ok - " + line)
        else:
            ok = False
            reasons.append("SLOW HOST FAIL (< %.2fx) - %s" % (MIN_RATIO, line))
    else:
        ok = False
        reasons.append("SLOW HOST FAIL - missing sentinel provenance "
                       "(floor_sentinel=%r, %d pass sentinels)"
                       % (floor_s, len(sentinels)))

    gc = {}
    for f in ev.get("dispersion_files", []):
        try:
            qs = json.load(open(f)).get("queries", {})
        except Exception:
            continue
        for c in confirmed:
            v = qs.get(c["q"])
            if isinstance(v, dict) and isinstance(v.get("gc_ms"), (int, float)):
                gc[c["q"]] = max(gc.get(c["q"], 0), v["gc_ms"])
    bar = ev.get("bar", 1.5)
    floor_of = {c["q"]: c["floor"] for c in confirmed}
    t_of = {c["q"]: c["t"] for c in confirmed}
    # condemned = gassy AND still over bar once the pause is discounted
    gassy = {q: ms for q, ms in gc.items()
             if ms > MAX_GC_MS and t_of[q] - ms / 1000.0 > bar * floor_of[q]}
    excused = {q: ms for q, ms in gc.items()
               if ms > MAX_GC_MS and q not in gassy}
    missing = [c["q"] for c in confirmed if c["q"] not in gc]
    if gassy or missing:
        ok = False
        reasons.append("NOT-GC FAIL - gc_ms over %dms and still over bar "
                       "when discounted: %s; no gc_ms data: %s"
                       % (MAX_GC_MS, gassy or "none", missing or "none"))
    else:
        reasons.append("NOT-GC ok - confirmed-query gc_ms: %s%s"
                       % (gc, "; pause-explained (discounted time clears "
                          "the bar): %s" % excused if excused else ""))

    fams = sorted({family(q) for q in ev.get("overbar_any", [])})
    if len(fams) >= MIN_FAMILIES:
        reasons.append("BROAD ok - over-bar queries span %d families: %s"
                       % (len(fams), ", ".join(fams)))
    else:
        ok = False
        reasons.append("BROAD FAIL - over-bar queries span only %d "
                       "families (%s); a concentrated violation is a real "
                       "regression" % (len(fams), ", ".join(fams) or "none"))

    verdict = "OVER-BAR/SLOW-HOST (advisory)" if ok else "REGRESSION"
    print("weather_verdict: %s" % verdict)
    for c in confirmed:
        print("  confirmed: %s %.3fs vs floor %.3fs (%.2fx > %sx)"
              % (c["q"], c["t"], c["floor"], c["t"] / c["floor"],
                 ev.get("bar", 1.5)))
    for r in reasons:
        print("  " + r)
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
