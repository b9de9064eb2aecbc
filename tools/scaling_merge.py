#!/usr/bin/env python3
"""Merge two Bench artifacts (base scale + 10x derived scale) into
BENCH_scaling.json: per-query times at both scales and the empirical
scaling exponent alpha = log10(t_big / t_base) for a 10x data ratio —
alpha 1.0 = perfectly linear, <1 = sublinear (fixed overheads amortize),
>1.2 flagged for adjudication (expected only for the deliberately
superlinear families; anything else is a latent scale bug).

Usage: python3 tools/scaling_merge.py <base.json> <big.json> [out.json]
"""
import json, math, sys

def main():
    base_p, big_p = sys.argv[1], sys.argv[2]
    out_p = sys.argv[3] if len(sys.argv) > 3 else "BENCH_scaling.json"
    base = json.load(open(base_p))
    big = json.load(open(big_p))
    qs = {}
    flagged = []
    for q, tb in sorted(base["queries"].items()):
        t1 = big["queries"].get(q)
        if t1 is None:
            continue
        # sub-0.2s base queries are overhead-dominated at BOTH scales;
        # their ratios measure the scheduler, not the operator
        alpha = (round(math.log10(t1 / tb), 3)
                 if tb >= 0.2 and t1 > 0 else None)
        qs[q] = {"t_base": tb, "t_10x": t1, "alpha": alpha}
        if alpha is not None and alpha > 1.2:
            flagged.append(q)
    alphas = sorted(v["alpha"] for v in qs.values()
                    if v["alpha"] is not None)
    out = {
        "base": {"sf": base["sf"], "total": base["value"],
                 "cal_min": base.get("cal_min"),
                 "cal_max": base.get("cal_max")},
        "big": {"sf": big["sf"], "total": big["value"],
                "cal_min": big.get("cal_min"),
                "cal_max": big.get("cal_max")},
        "data_ratio": 10.0,
        "method": "min_of_2 at both scales; alpha = log10(t_10x/t_base)",
        "n_measured": len(alphas),
        "alpha_median": alphas[len(alphas) // 2] if alphas else None,
        "alpha_p90": alphas[int(len(alphas) * 0.9)] if alphas else None,
        "flagged_gt_1_2": sorted(flagged),
        "queries": qs,
    }
    json.dump(out, open(out_p, "w"), indent=1)
    print(f"wrote {out_p}: {len(alphas)} measured, "
          f"median alpha {out['alpha_median']}, "
          f"{len(flagged)} flagged >1.2: {sorted(flagged)}")

if __name__ == "__main__":
    main()
