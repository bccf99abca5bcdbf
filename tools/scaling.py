#!/usr/bin/env python3
"""Scale-slope certification: fit per-query time-vs-scale slopes for graft
and the DuckDB oracle from bench sweeps at several scale factors, and emit
SCALING.json — the one-page linearity proof behind docs/PERF.md.

Usage:
  python3 tools/scaling.py OUT.json \
      sf0.001=BENCH1.json,DUCK1.json sf0.01=BENCH2.json,DUCK2.json ...

BENCH*.json are graft Bench's BENCH_LOCAL.json copies (min-of-N per query);
DUCK*.json are tools/duck_bench.py outputs over the identical oracle SQL.

Method: slope = log10(t_hi / t_lo) over the LARGEST measured decade
(sf0.01 -> sf0.1 by default), i.e. the empirical exponent b in t ∝ sf^b
where it matters — small-sf points sit on Spark's fixed per-stage
scheduling floor (~0.1-0.3 s) and would understate the data-dependent
slope, so they are reported but not certified against.

Certification: a query is `certified_linear` when its graft slope over the
top decade is <= 1.05 (10x the input -> at most ~11x the time), and
`beats_oracle_slope` when graft's slope <= DuckDB's on identical SQL —
a super-linear graft slope paired with a linear oracle slope is a real
plan defect; matched super-linear slopes mean the OUTPUT (e.g. the pair
set of a near-dup query) grows super-linearly, which no engine avoids.
"""
import json
import math
import sys


def main():
    out_path = sys.argv[1]
    sweeps = []  # (sf, graft_queries, duck_queries)
    for arg in sys.argv[2:]:
        sf_s, files = arg.split("=")
        bench_f, duck_f = files.split(",")
        bench = json.load(open(bench_f))
        duck = json.load(open(duck_f))
        sweeps.append((float(sf_s.replace("sf", "")),
                       bench["queries"], duck["queries"]))
    sweeps.sort()
    assert len(sweeps) >= 2, "need at least two scale factors"
    sf_lo, g_lo, d_lo = sweeps[-2]
    sf_hi, g_hi, d_hi = sweeps[-1]
    decade = math.log10(sf_hi / sf_lo)

    def slope(lo, hi):
        if lo is None or hi is None or lo <= 0 or hi <= 0:
            return None
        return round(math.log10(hi / lo) / decade, 3)

    names = sorted(set(g_hi) & set(g_lo))
    per_query = {}
    n_cert = n_beats = 0
    for name in names:
        sg = slope(g_lo.get(name), g_hi.get(name))
        sd = slope(d_lo.get(name), d_hi.get(name))
        t_hi = g_hi.get(name)
        floor = t_hi is not None and t_hi < 0.5  # scheduling-floor territory
        cert = sg is not None and sg <= 1.05
        beats = sg is not None and sd is not None and sg <= sd + 1e-9
        n_cert += cert
        n_beats += beats
        row = {
            "slope_graft": sg, "slope_duck": sd,
            "certified_linear": cert, "beats_oracle_slope": beats,
            "floor_dominated": floor,
        }
        for sf, gq, dq in sweeps:
            row[f"graft_s_sf{sf}"] = gq.get(name)
            row[f"duck_s_sf{sf}"] = dq.get(name)
        per_query[name] = row

    worst = sorted(
        (n for n in names if per_query[n]["slope_graft"] is not None),
        key=lambda n: -per_query[n]["slope_graft"])[:5]
    summary = {
        "decade": f"sf{sf_lo} -> sf{sf_hi}",
        "n_queries": len(names),
        "n_certified_linear": n_cert,
        "n_beats_oracle_slope": n_beats,
        "n_floor_dominated": sum(1 for n in names
                                 if per_query[n]["floor_dominated"]),
        "worst_graft_slopes": [
            {"query": n, "slope_graft": per_query[n]["slope_graft"],
             "slope_duck": per_query[n]["slope_duck"]} for n in worst],
    }
    method = ("slope = log10(t_hi/t_lo) / log10(sf_hi/sf_lo) over the largest "
              "measured decade, i.e. the empirical exponent b in t ~ sf^b; "
              "certified_linear = graft slope <= 1.05; beats_oracle_slope = "
              "graft slope <= DuckDB slope on identical SQL; floor_dominated = "
              "graft t(sf_hi) < 0.5 s (scheduling-floor territory).")
    json.dump({"method": method,
               "summary": summary, "per_query": per_query},
              open(out_path, "w"), indent=1, sort_keys=True)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
