#!/usr/bin/env python3
"""Mechanical slow-host adjudication for benchCheck.

Rounds 11-14 each ended with a benchCheck red that a human then
adjudicated in prose as host weather. The harness records everything
those adjudications used; this tool IS the decision rule, so the verdict
is reproducible from the transcript instead of re-argued per round. Two
gates, two modes:

  weather_verdict.py <floors_events.json>          # confirmed floor overages
  weather_verdict.py --spread <spread_events.json> # the dispersion bar

FLOORS MODE - input written by the benchCheck sbt task when a floor
overage is confirmed in two contention-clean passes:

  {
    "bar": 1.5,
    "floor_sentinel": 0.0093,          # tools/bench_floors.json _floor_sentinel_ref
    "pass_sentinels": [0.0111, ...],   # sentinel_ref of every executed pass
    "confirmed": [{"q": "...", "t": 0.308, "floor": 0.193, "pass": 2}, ...],
    "overbar_any": ["q..."],           # over bar in ANY contention-clean pass
    "dispersion_files": ["/tmp/benchcheck_pass1/bench_dispersion.json", ...]
  }

Decision rule (ALL must hold for the advisory verdict):
  1. SLOW HOST: every executed pass's machine-speed ratio
     (pass sentinel_ref / floor-era sentinel_ref) >= 1.15 - the host
     never reached floor-era speed, so floor-relative bars are
     structurally inflated. Missing sentinel data fails this clause
     (no provenance -> no advisory).
  2. NOT GC: every confirmed query's gc_ms <= 50 ms, OR its
     GC-discounted time (t - gc_ms) clears the bar - a pause-inflated
     min on an otherwise-weather-consistent host is a measurement
     artifact (the pause EXPLAINS the overage), while a genuine
     JVM-pause / memory regression stays red because even its GC-free
     time is over bar. The discount uses the CONFIRMING pass's own
     gc_ms when the evidence carries a "pass" index (ADVICE r14: a
     pause recorded in a different pass must not excuse a time it did
     not inflate); legacy evidence without the index falls back to the
     max across passes, printed as such.
  3. BROAD: the CONFIRMED queries span >= 3 distinct name-derived
     families (the token after the qNN_ prefix). ADVICE r14 tightening:
     r11-r14 computed breadth over every query over bar in ANY single
     clean pass, which let transient one-pass noise vouch for a real
     confirmed regression. A 1-2-family confirmed set is red BY DESIGN
     - a concentrated confirmation is exactly what a real regression
     looks like; if it is in fact weather, the remedy is a clean-host
     floor re-measurement, not a wider excuse.
  4. MAGNITUDE: every confirmed query's t/floor <= bar x (worst pass
     sentinel ratio) - the measured slowdown bounds the excusable
     overage (ADVICE r14: a 3x-over-floor confirmation on a 1.15x host
     is NOT explained by the weather and must stay red).

SPREAD MODE - input written when the >=85%-within-1.25x dispersion bar
fails (the r13/r14 rounds' last hand-adjudicated red):

  {
    "spread_bar": 1.25, "spread_min": 0.85,
    "pass1_sentinel": 0.0114,          # pass 1 bench_queries.json sentinel_ref
    "floor_sentinel": 0.0093,
    "dispersion_file": "/tmp/benchcheck_pass1/bench_dispersion.json"
  }

Decision rule (ALL must hold for the advisory verdict):
  1. SLOW/NOISY HOST: pass-1 sentinel_ref / floor-era sentinel_ref
     >= 1.15 (wall-to-wall slowdown - the run's quietest instant never
     reached floor-era speed), OR the median per-query sentinel_ratio
     >= 1.15 (intermittent contention: the run-wide floor was quiet but
     the median query block ran bracketed by elevated sentinels). An
     idle floor-speed host fails both -> the dispersion is the
     engine's own and stays red.
  2. NOT GC: violations (spread > spread_bar) whose GC-discounted
     spread (max_pass - gc_ms/1000) / min_pass <= spread_bar are
     excused - the recorded pause explains the dispersion. If the
     excused set alone brings the run back over spread_min, the
     verdict is advisory regardless of the other clauses.
  3. BROAD: the remaining violations span >= 3 distinct families -
     noise smears across unrelated code paths; a concentrated
     dispersion is a real (if unstable) regression signature.

Exit 0 + "... (advisory)" when the mode's clauses hold; exit 2 +
"REGRESSION" otherwise. The caller treats 0 as a loudly-annotated green
and anything else as the historical red.
"""
import json
import re
import statistics
import sys

MIN_RATIO = 1.15
MAX_GC_MS = 50
MIN_FAMILIES = 3


def family(qname):
    """q45_var_forecast_fixed -> 'var'; q28_periodogram -> 'periodogram'."""
    m = re.match(r"q\d+_([a-z0-9]+)", qname)
    return m.group(1) if m else qname


def floors_verdict(path):
    ev = json.load(open(path))
    confirmed = ev.get("confirmed", [])
    if not confirmed:
        print("weather_verdict: no confirmed violations - nothing to adjudicate")
        return 0

    reasons, ok = [], True

    floor_s = ev.get("floor_sentinel")
    sentinels = [s for s in ev.get("pass_sentinels", []) if s]
    worst_ratio = None
    if floor_s and sentinels:
        ratios = [s / floor_s for s in sentinels]
        worst_ratio = max(ratios)
        line = "machine speed: pass ratios %s vs floor era (min %.2fx)" % (
            ["%.2f" % r for r in ratios], min(ratios))
        if min(ratios) >= MIN_RATIO:
            reasons.append("SLOW HOST ok - " + line)
        else:
            ok = False
            reasons.append("SLOW HOST FAIL (< %.2fx) - %s" % (MIN_RATIO, line))
    else:
        ok = False
        reasons.append("SLOW HOST FAIL - missing sentinel provenance "
                       "(floor_sentinel=%r, %d pass sentinels)"
                       % (floor_s, len(sentinels)))

    # per-query gc: the confirming pass's own artifact when "pass" is
    # recorded (ADVICE r14), else the legacy max-across-passes fallback
    files = ev.get("dispersion_files", [])
    disp = []
    for f in files:
        try:
            disp.append(json.load(open(f)).get("queries", {}))
        except Exception:
            disp.append({})
    gc, gc_src = {}, {}
    for c in confirmed:
        q, p = c["q"], c.get("pass")
        if isinstance(p, int) and 1 <= p <= len(disp):
            v = disp[p - 1].get(q)
            if isinstance(v, dict) and isinstance(v.get("gc_ms"), (int, float)):
                gc[q], gc_src[q] = v["gc_ms"], "pass %d" % p
        else:
            for d in disp:
                v = d.get(q)
                if isinstance(v, dict) and isinstance(v.get("gc_ms"), (int, float)):
                    gc[q] = max(gc.get(q, 0), v["gc_ms"])
                    gc_src[q] = "max across passes (no pass index)"
    bar = ev.get("bar", 1.5)
    floor_of = {c["q"]: c["floor"] for c in confirmed}
    t_of = {c["q"]: c["t"] for c in confirmed}
    # condemned = gassy AND still over bar once the pause is discounted
    gassy = {q: ms for q, ms in gc.items()
             if ms > MAX_GC_MS and t_of[q] - ms / 1000.0 > bar * floor_of[q]}
    excused = {q: "%sms (%s)" % (ms, gc_src[q]) for q, ms in gc.items()
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

    # breadth over CONFIRMED queries only (ADVICE r14) - one-pass noise
    # singletons no longer vouch for a confirmed regression
    fams = sorted({family(c["q"]) for c in confirmed})
    any_fams = sorted({family(q) for q in ev.get("overbar_any", [])})
    if len(fams) >= MIN_FAMILIES:
        reasons.append("BROAD ok - confirmed queries span %d families: %s "
                       "(one-pass over-bar spanned %d, informational)"
                       % (len(fams), ", ".join(fams), len(any_fams)))
    else:
        ok = False
        reasons.append("BROAD FAIL - confirmed queries span only %d "
                       "families (%s); a concentrated confirmation is a "
                       "real regression (one-pass over-bar spanned %d, "
                       "which no longer vouches - ADVICE r14)"
                       % (len(fams), ", ".join(fams) or "none", len(any_fams)))

    # excusable overage is bounded by the measured slowdown (ADVICE r14)
    if worst_ratio:
        cap = bar * worst_ratio
        over_cap = {c["q"]: round(c["t"] / c["floor"], 3) for c in confirmed
                    if c["t"] / c["floor"] > cap}
        if over_cap:
            ok = False
            reasons.append("MAGNITUDE FAIL - t/floor beyond bar x worst "
                           "sentinel ratio (%.2f x %.2f = %.2fx): %s - the "
                           "measured slowdown does not explain the overage"
                           % (bar, worst_ratio, cap, over_cap))
        else:
            reasons.append("MAGNITUDE ok - every confirmed t/floor <= "
                           "%.2fx (bar %.2f x worst sentinel ratio %.2f)"
                           % (cap, bar, worst_ratio))

    verdict = "OVER-BAR/SLOW-HOST (advisory)" if ok else "REGRESSION"
    print("weather_verdict: %s" % verdict)
    for c in confirmed:
        print("  confirmed: %s %.3fs vs floor %.3fs (%.2fx > %sx)"
              % (c["q"], c["t"], c["floor"], c["t"] / c["floor"],
                 ev.get("bar", 1.5)))
    for r in reasons:
        print("  " + r)
    return 0 if ok else 2


def spread_verdict(path):
    ev = json.load(open(path))
    spread_bar = ev.get("spread_bar", 1.25)
    spread_min = ev.get("spread_min", 0.85)
    d = json.load(open(ev["dispersion_file"]))
    qs = {k: v for k, v in d.get("queries", {}).items()
          if isinstance(v, dict) and "spread" in v}
    if not qs:
        print("weather_verdict[spread]: no dispersion data - REGRESSION "
              "(no provenance -> no advisory)")
        return 2
    reasons, ok = [], True

    viol = {q: v for q, v in qs.items() if v["spread"] > spread_bar}
    pct = 1.0 - len(viol) / float(len(qs))
    print("weather_verdict[spread]: %d/%d within %.2fx (%.0f%% vs %.0f%% bar)"
          % (len(qs) - len(viol), len(qs), spread_bar, pct * 100,
             spread_min * 100))

    # clause 1: slow/noisy host - wall-to-wall (run sentinel floor never
    # reached floor-era speed) OR intermittent (median per-query block
    # sentinel elevated vs the run's own quietest instant)
    p1, fs = ev.get("pass1_sentinel"), ev.get("floor_sentinel")
    run_ratio = (p1 / fs) if (p1 and fs) else None
    med_local = statistics.median(
        v["sentinel_ratio"] for v in qs.values()
        if isinstance(v.get("sentinel_ratio"), (int, float)))
    host_slow = (run_ratio is not None and run_ratio >= MIN_RATIO) or \
        med_local >= MIN_RATIO
    line = ("run sentinel %.2fx floor era, median per-query block "
            "sentinel %.2fx run floor") % (run_ratio or -1, med_local)
    if host_slow:
        reasons.append("SLOW/NOISY HOST ok - " + line)
    else:
        ok = False
        reasons.append("SLOW/NOISY HOST FAIL (both < %.2fx) - %s - a "
                       "floor-speed idle host owns its dispersion"
                       % (MIN_RATIO, line))

    # clause 2: gc-discounted spread - the pause explains the dispersion
    def disc_spread(v):
        passes = [p for p in v.get("passes", []) if p]
        if len(passes) < 2:
            return v["spread"]
        gc_s = (v.get("gc_ms") or 0) / 1000.0
        return max(1.0, (max(passes) - gc_s) / min(passes))
    excused = {q: v["spread"] for q, v in viol.items()
               if disc_spread(v) <= spread_bar}
    remaining = {q: v for q, v in viol.items() if q not in excused}
    if excused:
        reasons.append("NOT-GC - %d violation(s) pause-explained "
                       "(discounted spread <= %.2fx): %s"
                       % (len(excused), spread_bar, sorted(excused)))
    pct_disc = 1.0 - len(remaining) / float(len(qs))
    if pct_disc >= spread_min:
        print("weather_verdict[spread]: OVER-SPREAD/GC (advisory) - "
              "%.0f%% within bar after GC discount" % (pct_disc * 100))
        for r in reasons:
            print("  " + r)
        return 0

    # clause 3: breadth of the remaining violations
    fams = sorted({family(q) for q in remaining})
    if len(fams) >= MIN_FAMILIES:
        reasons.append("BROAD ok - %d undischarged violations span %d "
                       "families" % (len(remaining), len(fams)))
    else:
        ok = False
        reasons.append("BROAD FAIL - violations span only %d families "
                       "(%s); concentrated dispersion is a real signature"
                       % (len(fams), ", ".join(fams) or "none"))

    verdict = "OVER-SPREAD/SLOW-HOST (advisory)" if ok else "REGRESSION"
    print("weather_verdict[spread]: %s" % verdict)
    worst = sorted(remaining.items(), key=lambda kv: -kv[1]["spread"])[:8]
    for q, v in worst:
        print("  violation: %s spread %.2fx (sentinel_ratio %.2f, gc_ms %s)"
              % (q, v["spread"], v.get("sentinel_ratio", -1),
                 v.get("gc_ms", "?")))
    for r in reasons:
        print("  " + r)
    return 0 if ok else 2


if __name__ == "__main__":
    if sys.argv[1] == "--spread":
        sys.exit(spread_verdict(sys.argv[2]))
    sys.exit(floors_verdict(sys.argv[1]))
