"""Flagship science runs: reproduce the reference's published benchmark
rows (Benchmarks/Results.tex) entirely from in-repo physics.

Systems (geometry -> cc-pVDZ-class integrals -> symmetry RHF -> native
CISD trial -> frisys HB-PP driver; every stage validated against the
reference's surviving PySCF outputs in tests/test_ccpvdz.py +
tests/test_cisd.py):

  ne   Ne aug-cc-pVDZ, published row Results.tex:16-25
       (100k nonz, initiator 0.5, error 0.0223 +/- 0.0070 mEh, eff 85802)
  n2   N2 cc-pVDZ eq, published row Results.tex:63-71
       (1M nonz, initiator 0.5, error 0.0275 +/- 0.0208 mEh, eff 9592);
       --determ 150 adds the semistochastic 150-det subspace row (:142).
  h2o  H2O cc-pVDZ, published row Results.tex:43-46
       (1M nonz, error 0.0171 +/- 0.0067 mEh, eff 92963)

Protocol mirrors the reference commands: --target == vec_nonz == mat_nonz,
initiator 0.5, CISD initial vector.  The initial norm starts at
--init_frac * target (reference starts at the raw CISD norm and burns
~40k iterations of slow exponential growth; starting at half target keeps
the same "grow into the target, then lock the shift" dynamics at a burn-in
the wall clock affords.  Starting AT the target was measured unstable on
N2: the shift has no growth phase to find the ground state first, and the
run collapses into the noise-dominated regime with the trial overlap
decaying to zero).

    python tools/flagship.py --system ne --iters 16000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

import numpy as np

# exact correlation energies, Benchmarks/calc_stats.py:7-10 / BASELINE.md
SYSTEMS = {
    "ne": {
        "exact_corr": -0.213127,
        "budget": 100_000,
        "capacity": 1 << 18,
        "published": "Results.tex:21-25: 0.0223 +/- 0.0070 mEh, eff 85802",
    },
    "n2": {
        "exact_corr": -0.321981,
        "budget": 1_000_000,
        "capacity": 1 << 21,
        "published": "Results.tex:64: 0.0275 +/- 0.0208 mEh, eff 9592",
    },
    "h2o": {
        "exact_corr": -0.217830,
        "budget": 1_000_000,
        "capacity": 1 << 21,
        "published": "Results.tex:46: 0.0171 +/- 0.0067 mEh, eff 92963",
    },
}


def build_system(name, cache_dir="/tmp"):
    """(ham, trial_words, trial_vals, e_cisd) for a flagship system,
    cached on disk."""
    import jax.numpy as jnp
    from fries_tpu.ops import molecule as mol

    cache = os.path.join(cache_dir, f"flagship_{name}.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        ham = mol.MolecularHamiltonian(
            hcore=jnp.asarray(d["hcore"]), eris=jnp.asarray(d["eris"]),
            symm=jnp.asarray(d["symm"]), n_orb=int(d["n_orb"]),
            n_elec=int(d["n_elec"]), n_frozen=int(d["n_frozen"]))
        return ham, d["trial_words"], d["trial_vals"], float(d["e_cisd"])

    from fries_tpu import scf, cisd

    if name == "ne":
        ham, info = scf.build_molecule(("Ne",), np.zeros((1, 3)),
                                       basis="aug-cc-pvdz", n_frozen=2)
    elif name == "n2":
        r = 2.068
        centers = np.array([[0.0, 0.0, -r / 2], [0.0, 0.0, r / 2]])
        ham, info = scf.build_molecule(("N", "N"), centers,
                                       basis="cc-pvdz", n_frozen=4)
    elif name == "h2o":
        r, th = 1.84345, np.deg2rad(110.6)
        y, z = r * np.sin(th / 2), r * np.cos(th / 2)
        centers = np.array([[0.0, 0.0, 0.0], [0.0, y, z], [0.0, -y, z]])
        ham, info = scf.build_molecule(("O", "H", "H"), centers,
                                       basis="cc-pvdz", n_frozen=0)
    else:
        raise SystemExit(f"unknown system {name}")
    print(f"# RHF e_elec = {info['e_elec']:.10f}", flush=True)
    e_cisd, words, vec = cisd.cisd_ground_state(ham)
    print(f"# CISD e_corr = {e_cisd:.6f} over {len(words)} dets", flush=True)
    np.savez(cache, hcore=np.asarray(ham.hcore), eris=np.asarray(ham.eris),
             symm=np.asarray(ham.symm), n_orb=ham.n_orb, n_elec=ham.n_elec,
             n_frozen=ham.n_frozen, trial_words=words, trial_vals=vec,
             e_cisd=e_cisd)
    return ham, words, vec, e_cisd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--system", choices=sorted(SYSTEMS), default="ne")
    ap.add_argument("--iters", type=int, default=16000)
    ap.add_argument("--burn", type=int, default=5000)
    ap.add_argument("--eps", type=float, default=0.001)
    ap.add_argument("--budget", type=int, default=0,
                    help="vec_nonz = matr_samp = target (0 = published)")
    ap.add_argument("--capacity", type=int, default=0)
    ap.add_argument("--initiator", type=float, default=0.5)
    ap.add_argument("--init_frac", type=float, default=0.5,
                    help="initial 1-norm as a fraction of target; 0 = the "
                         "reference's own free-growth protocol (start at "
                         "the RAW CISD norm and let the S=0 growth phase "
                         "carry the population to the target, "
                         "frisys_mol.cpp + N2_load/S.txt artifact)")
    ap.add_argument("--determ", type=int, default=0,
                    help="semistochastic: use the top-k CISD dets as the "
                         "deterministic subspace (Results.tex:142 class)")
    ap.add_argument("--trial_k", type=int, default=0,
                    help="truncate the estimator trial vector to the top-k "
                         "CISD dets (0 = full CISD).  The published rows "
                         "use a bare HF trial (Results.tex tables); any "
                         "CISD truncation is still a far lower-variance "
                         "estimator, and a smaller trial shrinks the "
                         "H|trial> lookup each iteration pays.")
    ap.add_argument("--damp", type=float, default=1.0,
                    help="shift damping.  The published runs use the "
                         "reference default 0.05 with a ~40k-iteration "
                         "natural growth phase; starting at --init_frac of "
                         "the target instead needs DEADBEAT control (1.0: "
                         "one window cancels the measured growth rate) or "
                         "the norm overshoots the target ~20x before the "
                         "rate-only controller engages and the initiator "
                         "threshold (absolute walker units) loses meaning "
                         "(measured 2026-08-20: n_a=1.0 run hit norm "
                         "1.76e7 at S=-14 by iteration 500).")
    ap.add_argument("--track", type=float, default=0.05,
                    help="target-tracking shift term (power.PowerConfig."
                         "shift_tracking): pins the stationary one-norm AT "
                         "the target so the initiator threshold keeps its "
                         "published walker-unit calibration; 0 = reference "
                         "rate-only controller")
    ap.add_argument("--scan", type=int, default=25)
    ap.add_argument("--block", type=int, default=500)
    ap.add_argument("--seed", type=int, default=20)
    ap.add_argument("--result_dir", default="")
    ap.add_argument("--max_hours", type=float, default=100.0)
    args = ap.parse_args()

    meta = SYSTEMS[args.system]
    budget = args.budget or meta["budget"]
    capacity = args.capacity or meta["capacity"]
    result_dir = args.result_dir or f"/tmp/flagship_{args.system}"

    from fries_tpu import stats
    from fries_tpu.drivers import frisys

    ham, twords, tvals, e_cisd = build_system(args.system)
    if args.trial_k and args.trial_k < len(tvals):
        top = np.argsort(-np.abs(tvals))[: args.trial_k]
        twords, tvals = twords[top], tvals[top]
    print(f"# trial: {len(tvals)} CISD dets", flush=True)

    cfg = frisys.FrisysConfig(
        eps=args.eps, vec_nonz=budget, matr_samp=budget,
        capacity=capacity, spawn_cap=budget + 32_768,
        target_norm=float(budget), init_thresh=args.initiator,
        shift_damping=args.damp, shift_tracking=args.track,
    )
    determ_keys = None
    if args.determ:
        top = np.argsort(-np.abs(tvals))[: args.determ]
        determ_keys = twords[top]
    if args.init_frac > 0:
        scale = args.init_frac * budget / np.abs(tvals).sum()
    else:
        scale = 1.0  # free growth from the raw CISD vector
    t0 = time.time()
    step, run_steps, state, aux = frisys.build(
        ham, cfg, seed=args.seed, trial=(twords, tvals),
        init_vec=(twords, tvals * scale), determ_keys=determ_keys)
    print(f"# build done ({time.time() - t0:.0f}s); e_ref = "
          f"{float(aux['e_ref']):.10f}; H|trial> = "
          f"{len(aux['num_vals'])} rows (per-iter estimator lookup)",
          flush=True)

    os.makedirs(result_dir, exist_ok=True)
    streams = {name: open(os.path.join(result_dir, f"{name}.txt"), "a")
               for name in ("projnum", "projden", "S", "norm", "nkept")}
    nums, dens = [], []
    run_args = [aux["num_keys"], aux["num_vals"], aux["den_keys"],
                aux["den_vals"], aux["ref_key"]]
    extra = {}
    if determ_keys is not None:
        extra["protected_keys"] = aux["protected_keys"]
    t0 = time.time()
    done = 0
    n_blocks = -(-args.iters // args.block)
    for blk in range(n_blocks):
        for _ in range(-(-args.block // args.scan)):
            state, traj = run_steps(state, *run_args, args.scan,
                                    extra.get("protected_keys"))
            nums.append(np.asarray(traj["proj_num"]).reshape(-1))
            dens.append(np.asarray(traj["proj_den"]).reshape(-1))
            for nm, key in (("projnum", "proj_num"), ("projden", "proj_den"),
                            ("S", "shift"), ("norm", "norm")):
                for v in np.asarray(traj[key]).reshape(-1):
                    streams[nm].write(f"{float(v)!r}\n")
            for v in np.asarray(traj["n_dets"]).reshape(-1):
                streams["nkept"].write(f"{int(v)}\n")
            done += args.scan
        for f in streams.values():
            f.flush()
        ov = bool(np.asarray(traj["overflow"]).any())
        el = time.time() - t0
        wnum = np.concatenate(nums[-20:])
        wden = np.concatenate(dens[-20:])
        e_run = np.mean(wnum) / np.mean(wden)
        print(f"# blk {blk + 1}/{n_blocks} it={done} {el:.0f}s "
              f"{el / done * 1e3:.0f} ms/it e_win={e_run:.6f} "
              f"den_win={np.mean(wden):.3e} "
              f"S={float(np.asarray(traj['shift']).reshape(-1)[-1]):.4f} "
              f"norm={float(np.asarray(traj['norm']).reshape(-1)[-1]):.3e} "
              f"overflow={ov}", flush=True)
        if ov:
            raise SystemExit("arena overflow")
        if el > args.max_hours * 3600:
            print("# wall-clock budget reached", flush=True)
            break

    num = np.concatenate(nums)
    den = np.concatenate(dens)
    np.save(os.path.join(result_dir, "num.npy"), num)
    np.save(os.path.join(result_dir, "den.npy"), den)
    burn = min(args.burn, len(num) * 2 // 3)
    out = stats.trajectory_stats(num, den, exact_corr=meta["exact_corr"],
                                 burn_in=burn)
    result = {
        "system": args.system,
        "config": f"FCI-FRI HB sys, n_a={args.initiator}, {budget} nonz, "
                  f"eps={args.eps}"
                  + (f", semistoch {args.determ}" if args.determ else ""),
        "iters": int(len(num)),
        "burn_in": int(burn),
        "e_ref": float(aux["e_ref"]),
        "e_cisd_corr": float(e_cisd),
        "exact_corr": meta["exact_corr"],
        "iat": float(out["iat"]),
        "efficiency": float(out["efficiency"]),
        "sec_per_iter": (time.time() - t0) / max(done, 1),
        "published_row": meta["published"],
    }
    # honesty gate: an error bar on a trajectory with fewer than ~20
    # independent post-burn samples (N_post / IAT) mostly measures the
    # unconverged transient, not the stationary error — refuse to quote it
    # (the reference's own runs burn 40k+ iterations before quoting,
    # Results.tex:63 protocol)
    n_post = len(num) - burn
    n_indep = n_post / max(out["iat"], 1.0)
    result["n_independent_samples"] = round(float(n_indep), 1)
    if n_indep >= 20.0:
        result["error_mEh"] = float(out["error_mEh"])
        result["two_sigma_mEh"] = float(out["two_sigma_mEh"])
    else:
        result["diagnosis"] = (
            f"TRANSIENT NOT BURNED IN: {n_post} post-burn iterations at "
            f"IAT {out['iat']:.0f} = {n_indep:.1f} independent samples "
            f"(< 20); the stationary error bar is not quotable. "
            f"Unconverged point estimate: {out['error_mEh']:+.3f} mEh "
            f"(would-be 2sigma {out['two_sigma_mEh']:.3f})")
        result["unconverged_estimate_mEh"] = float(out["error_mEh"])
        print("# " + result["diagnosis"], flush=True)
    print(json.dumps(result), flush=True)
    with open(os.path.join(result_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
