"""Flagship science run: N2/cc-pVDZ systematic FCI-FRI at 1e6 kept
determinants with a native CISD trial — the reference's headline
configuration (Benchmarks/Results.tex:64: FCI-FRI HB n_a=1, 1M nonzeros,
error 0.0275 ± 0.0208 mEh vs exact corr. energy −0.321981).

Everything is produced in-repo from the N2 geometry: cc-pVDZ integrals +
symmetry-adapted RHF (fries_tpu.scf, validated against the reference's
surviving PySCF outputs to ~1e-7), CISD trial (fries_tpu.cisd, matches the
reference's shipped cisd_vals to 8e-7), then the frisys HB-PP driver.

    python tools/n2_flagship.py --iters 16000 --result_dir /tmp/n2_run

Writes reference-style streams (projnum.txt, projden.txt, S.txt, norm.txt,
nkept.txt) plus a final JSON line with calc_stats-style error/efficiency.
The published protocol is eps=0.001 / 1M iterations; the in-round run uses
the same eps with as many iterations as the wall clock allows, so the
2-sigma bar scales as sqrt(1e6/iters) of the published 0.0208 mEh.
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

EXACT_CORR = -0.321981  # BASELINE.md / Benchmarks/calc_stats.py:7-10
N2_R = 2.068


def build_system(cache="/tmp/n2_ccpvdz_ham.npz"):
    """(ham, trial_words, trial_vals) for N2/cc-pVDZ, cached on disk."""
    import jax.numpy as jnp
    from fries_tpu.ops import molecule as mol

    if os.path.exists(cache):
        d = np.load(cache)
        ham = mol.MolecularHamiltonian(
            hcore=jnp.asarray(d["hcore"]), eris=jnp.asarray(d["eris"]),
            symm=jnp.asarray(d["symm"]), n_orb=int(d["n_orb"]),
            n_elec=int(d["n_elec"]), n_frozen=int(d["n_frozen"]))
        return ham, d["trial_words"], d["trial_vals"], float(d["e_cisd"])

    from fries_tpu import scf, cisd

    centers = np.array([[0.0, 0.0, -N2_R / 2], [0.0, 0.0, N2_R / 2]])
    ham, info = scf.build_molecule(("N", "N"), centers, basis="cc-pvdz",
                                   n_frozen=4)
    print(f"# RHF e_elec = {info['e_elec']:.10f} "
          f"(ref sys_params -132.6489437382)", flush=True)
    e_cisd, words, vec = cisd.cisd_ground_state(ham)
    print(f"# CISD e_corr = {e_cisd:.6f} over {len(words)} dets", flush=True)
    np.savez(cache, hcore=np.asarray(ham.hcore), eris=np.asarray(ham.eris),
             symm=np.asarray(ham.symm), n_orb=ham.n_orb, n_elec=ham.n_elec,
             n_frozen=ham.n_frozen, trial_words=words, trial_vals=vec,
             e_cisd=e_cisd)
    return ham, words, vec, e_cisd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16000)
    ap.add_argument("--burn", type=int, default=3000)
    ap.add_argument("--eps", type=float, default=0.001)
    ap.add_argument("--vec_nonz", type=int, default=1_000_000)
    ap.add_argument("--matr_samp", type=int, default=1_000_000)
    ap.add_argument("--capacity", type=int, default=1 << 21)
    ap.add_argument("--init_thresh", type=float, default=1.0)
    ap.add_argument("--trial_cut", type=float, default=0.0,
                    help="drop trial dets with |c| below this")
    ap.add_argument("--scan", type=int, default=25)
    ap.add_argument("--block", type=int, default=500)
    ap.add_argument("--seed", type=int, default=20)
    ap.add_argument("--result_dir", default="/tmp/n2_flagship")
    ap.add_argument("--max_hours", type=float, default=100.0,
                    help="stop cleanly after this much run time")
    args = ap.parse_args()

    from fries_tpu import stats
    from fries_tpu.drivers import frisys

    ham, twords, tvals, e_cisd = build_system()
    if args.trial_cut > 0:
        keep = np.abs(tvals) >= args.trial_cut
        twords, tvals = twords[keep], tvals[keep]
    print(f"# trial: {len(tvals)} CISD dets", flush=True)

    cfg = frisys.FrisysConfig(
        eps=args.eps, vec_nonz=args.vec_nonz, matr_samp=args.matr_samp,
        capacity=args.capacity, spawn_cap=args.matr_samp + 32_768,
        target_norm=2.0 * args.vec_nonz, init_thresh=args.init_thresh,
    )
    # start from the CISD vector scaled to the target norm: skips most of
    # the population-growth transient (the reference grows from HF over
    # ~1e4 iterations; the trial is a better starting point and the
    # remaining relaxation is burned in anyway)
    scale = 2.0 * args.vec_nonz / np.abs(tvals).sum()
    t0 = time.time()
    step, run_steps, state, aux = frisys.build(
        ham, cfg, seed=args.seed, trial=(twords, tvals),
        init_vec=(twords, tvals * scale))
    print(f"# build done ({time.time() - t0:.0f}s); e_ref = "
          f"{float(aux['e_ref']):.10f}", flush=True)

    os.makedirs(args.result_dir, exist_ok=True)
    streams = {name: open(os.path.join(args.result_dir, f"{name}.txt"), "a")
               for name in ("projnum", "projden", "S", "norm", "nkept")}
    nums, dens = [], []
    run_args = (aux["num_keys"], aux["num_vals"], aux["den_keys"],
                aux["den_vals"], aux["ref_key"])
    t0 = time.time()
    done = 0
    n_blocks = -(-args.iters // args.block)
    for blk in range(n_blocks):
        for _ in range(-(-args.block // args.scan)):
            state, traj = run_steps(state, *run_args, args.scan)
            num = np.asarray(traj["proj_num"]).reshape(-1)
            den = np.asarray(traj["proj_den"]).reshape(-1)
            nums.append(num)
            dens.append(den)
            for v in num:
                streams["projnum"].write(f"{v!r}\n")
            for v in den:
                streams["projden"].write(f"{v!r}\n")
            for v in np.asarray(traj["shift"]).reshape(-1):
                streams["S"].write(f"{v!r}\n")
            for v in np.asarray(traj["norm"]).reshape(-1):
                streams["norm"].write(f"{v!r}\n")
            for v in np.asarray(traj["n_dets"]).reshape(-1):
                streams["nkept"].write(f"{int(v)}\n")
            done += args.scan
        for f in streams.values():
            f.flush()
        ov = bool(np.asarray(traj["overflow"]).any())
        el = time.time() - t0
        e_run = (np.mean(np.concatenate(nums)[-2000:])
                 / np.mean(np.concatenate(dens)[-2000:]))
        print(f"# blk {blk + 1}/{n_blocks} it={done} {el:.0f}s "
              f"{el / done * 1e3:.0f} ms/it e_recent={e_run:.6f} "
              f"overflow={ov}", flush=True)
        if ov:
            raise SystemExit("arena overflow")
        if el > args.max_hours * 3600:
            print("# wall-clock budget reached", flush=True)
            break

    num = np.concatenate(nums)
    den = np.concatenate(dens)
    np.save(os.path.join(args.result_dir, "num.npy"), num)
    np.save(os.path.join(args.result_dir, "den.npy"), den)
    burn = min(args.burn, len(num) // 3)
    out = stats.trajectory_stats(num, den, exact_corr=EXACT_CORR,
                                 burn_in=burn)
    result = {
        "system": "N2/cc-pVDZ r=2.068 frozen-core (native integrals+CISD)",
        "config": "FCI-FRI HB sys, n_a=1, 1M vec nonz, 1M matr samp, "
                  f"eps={args.eps}",
        "iters": int(len(num)),
        "burn_in": int(burn),
        "e_ref": float(aux["e_ref"]),
        "e_cisd_corr": float(e_cisd),
        "exact_corr": EXACT_CORR,
        "error_mEh": float(out["error_mEh"]),
        "two_sigma_mEh": float(out["two_sigma_mEh"]),
        "iat": float(out["iat"]),
        "efficiency": float(out["efficiency"]),
        "sec_per_iter": (time.time() - t0) / max(done, 1),
        "published_row": "Results.tex:64: 0.0275 +/- 0.0208 mEh at 1M iters",
    }
    print(json.dumps(result), flush=True)
    with open(os.path.join(args.result_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
