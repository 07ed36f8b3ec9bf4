"""Package the round-5 N2 flagship run into results/ with the IAT gate.

Reads the run directory's num/den, computes gated statistics at the
chosen burn-in, compares against the published semistochastic row
(Results.tex N2 150-largest-CISD: 0.0408 +/- 0.0172 mEh), and writes
results/n2_ccpvdz_flagship.json + the raw trajectories.
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main():
    run_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flag_n2_r5c"
    burn = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    import jax

    jax.config.update("jax_platforms", "cpu")
    from fries_tpu import stats

    num = np.loadtxt(os.path.join(run_dir, "projnum.txt"))
    den = np.loadtxt(os.path.join(run_dir, "projden.txt"))
    n = min(len(num), len(den))
    num, den = num[:n], den[:n]
    exact = -0.321981
    burn = min(burn, n * 2 // 3)
    out = stats.trajectory_stats(num, den, exact_corr=exact, burn_in=burn)
    n_post = n - burn
    n_indep = n_post / max(out["iat"], 1.0)
    sec_per_iter = None
    logp = "/tmp/n2_run.log"
    result = {
        "system": "n2",
        "config": "FCI-FRI HB sys, n_a=1.0, 1e6 nonz, eps=0.001, "
                  "semistoch 150 largest CISD, CISD trial, deadbeat+"
                  "tracking norm control pinned at the 1e6 target",
        "iters": int(n),
        "burn_in": int(burn),
        "e_ref": -132.64894390840414,
        "exact_corr": exact,
        "e_corr": float(out["e_corr"]),
        "iat": float(out["iat"]),
        "efficiency": float(out["efficiency"]),
        "n_independent_samples": round(float(n_indep), 1),
        "published_row": "Results.tex semistochastic N2 1M, n_a=1.0, 150 "
                         "largest CISD: 0.0408 +/- 0.0172 mEh, eff 14145",
    }
    if n_indep >= 20.0:
        result["error_mEh"] = float(out["error_mEh"])
        result["two_sigma_mEh"] = float(out["two_sigma_mEh"])
        pub_mean, pub_2s = 0.0408, 0.0172
        comb = np.hypot(out["two_sigma_mEh"], pub_2s)
        result["consistent_with_published"] = bool(
            abs(out["error_mEh"] - pub_mean) <= comb)
        result["within_0p1_mEh"] = bool(abs(out["error_mEh"]) <= 0.1)
    else:
        result["diagnosis"] = (
            f"{n_post} post-burn iterations at IAT {out['iat']:.0f} = "
            f"{n_indep:.1f} independent samples (< 20): error bar not "
            f"quotable; point estimate {out['error_mEh']:+.3f} mEh")
        result["unconverged_estimate_mEh"] = float(out["error_mEh"])
    os.makedirs(os.path.join(_REPO, "results"), exist_ok=True)
    np.save(os.path.join(_REPO, "results", "n2_flagship_num.npy"), num)
    np.save(os.path.join(_REPO, "results", "n2_flagship_den.npy"), den)
    with open(os.path.join(_REPO, "results",
                           "n2_ccpvdz_flagship.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
