#!/usr/bin/env python3
"""Extend SCALING.json with the sf0.1 -> sf1 decade for the heavy-query
subset, GRAFT side only (the DuckDB oracle's recursive-CTE closure queries
run 200 s+ already at sf0.1; an sf1 oracle sweep would take hours and prove
nothing new about the Spark plans).

sf1 input is tools/gen_scaled.py's replica set (disjoint key/shingle
spaces, see its docstring) — per-query input grows ~10x with linear dup
mass, so a plan that is input-linear must show slope <= ~1.05 over this
decade too. This is the decade where Spark's fixed per-stage scheduling
floor (~0.1-0.3 s) no longer hides anything for multi-second queries.

Usage:
  python3 tools/scaling_sf1.py SCALING.json BENCH_sf0.1.json BENCH_sf1.json
Updates SCALING.json in place: per-query graft_s_sf1 + slope_graft_sf1 +
certified_linear_sf1, and a summary_sf1 block.
"""
import json
import math
import sys

# Per-family explanations for slopes > 1.05 over this decade: a super-linear
# slope here is either the documented problem shape (work that grows with
# probes x corpus because BOTH scale with sf) or a path dispatch, not an
# engine-plan defect. Queries not listed and not <= 1.05 are real findings.
EXPLAINED = {
    "q83_knn_join": "brute kNN eval: probe set is a fixed FRACTION of the "
        "corpus (vec_id % 25), so work = probes x corpus ~ sf^2 by contract; "
        "per-probe cost is linear and the serving path uses a fixed probe "
        "batch (linear in corpus). IVF/LSH are the corpus-scale paths.",
    "q84_ivf_knn_join": "IVF prunes a constant factor (nprobe/nlists); with "
        "probes ~ sf the probes x corpus product still ~ sf^2. Fixed probe "
        "batch => linear.",
    "q97_ann_recall": "recall eval joins brute truth (sf^2 by contract) "
        "with the ANN result; same probes-scale-with-corpus shape.",
    "q105_hard_negatives": "kNN-join derivative: same probes x corpus "
        "contract.",
    "q142_retrieval_eval": "per-probe eval over brute truth: same probes x "
        "corpus contract.",
    "q147_ndcg_eval": "graded per-probe eval over the same brute truth as "
        "q142: probes x corpus contract.",
    "q53_containment": "probe split is a fixed fraction (doc_id % 10); the "
        "bitmap fast path (chosen while vocab fits) is corpus x probe "
        "popcounts ~ sf^2; at larger vocab the dispatch falls to the "
        "inverted-index path whose cost tracks shared-shingle pairs.",
    "q90_decontaminate": "same containment dispatch as q53.",
    "q92_semantic_decontaminate": "semantic twin of q90: the benchmark side "
        "is a fixed FRACTION of the corpus (vec_id % 20), so the "
        "benchmark-broadcast cosine gate is benchmark x corpus ~ sf^2 by "
        "contract. A real decontamination run has a CONSTANT benchmark "
        "suite — that serving shape is q145 (sf1-certified linear).",
    "q30_ngram_jaccard": "pair scoring over shared-shingle candidates; "
        "within-replica dup mass is linear but the probe-fraction contract "
        "adds the q53 shape.",
    "q88_lsh_quality": "the exact-Jaccard truth half is quadratic in the "
        "SAMPLE; sampleFrac is fixed so the sample grows with sf. At real "
        "scale the tuning run fixes the sample SIZE (frac ~ 1/sf) and the "
        "stage is constant-cost — the maxExactRows gate enforces exactly "
        "this before a 100 TB pass.",
    "q73_semantic_dedup": "historical: with FIXED k the within-cluster pair "
        "work was ~ sf^2/k (slope 1.25 in r6). Round 7 implements the k ~ "
        "corpus policy (Clustering.autoK pins expected cluster size) plus a "
        "native NearestCentroid assignment, measuring slope ~0.6 — this "
        "entry remains only as the record of why the policy exists.",
}


def main():
    scaling_path, b01_path, b1_path = sys.argv[1:4]
    scaling = json.load(open(scaling_path))
    q01 = json.load(open(b01_path))["queries"]
    q1 = json.load(open(b1_path))["queries"]

    per = scaling["per_query"]
    n_cert = 0
    worst = []
    for name, t1 in sorted(q1.items()):
        t01 = q01.get(name)
        if t01 is None or t01 <= 0 or t1 <= 0:
            continue
        slope = round(math.log10(t1 / t01), 3)  # one decade: sf0.1 -> sf1
        entry = per.setdefault(name, {})
        entry["graft_s_sf1"] = round(t1, 3)
        entry["slope_graft_sf1"] = slope
        entry["certified_linear_sf1"] = slope <= 1.05
        n_cert += slope <= 1.05
        w = {"query": name, "slope_graft_sf1": slope,
             "graft_s_sf0.1": round(t01, 3),
             "graft_s_sf1": round(t1, 3)}
        if slope > 1.05:
            expl = EXPLAINED.get(name)
            assert expl is not None, (
                f"UNEXPLAINED super-linear sf1 slope for {name}: {slope}")
            w["explained"] = expl
            entry["sf1_superlinear_explained"] = expl
        worst.append(w)
    worst.sort(key=lambda w: -w["slope_graft_sf1"])
    scaling["summary_sf1"] = {
        "decade": "sf0.1 -> sf1 (graft only; sf1 = tools/gen_scaled.py "
                  "replicas of the driver's sf0.1 testdata)",
        "n_queries": len(worst),
        "n_certified_linear_sf1": n_cert,
        "n_superlinear_explained": sum(1 for w in worst if "explained" in w),
        "worst_graft_slopes_sf1": worst[:12],
        "note": "every slope > 1.05 carries an `explained` entry: the "
                "eval-harness queries pin probe COUNT to a fixed fraction "
                "of the corpus, so their work is probes x corpus ~ sf^2 by "
                "contract (per-probe cost stays linear; serving uses fixed "
                "probe batches), and the sample/cluster-parameter families "
                "are linear once the parameter follows the documented "
                "scale policy (fixed sample size; k ~ corpus).",
    }
    json.dump(scaling, open(scaling_path, "w"), indent=1, sort_keys=True)
    print(f"{len(worst)} queries, {n_cert} certified linear over sf0.1->sf1")
    for w in worst[:8]:
        print(f"  {w['query']}: slope {w['slope_graft_sf1']} "
              f"({w['graft_s_sf0.1']}s -> {w['graft_s_sf1']}s)")


if __name__ == "__main__":
    main()
