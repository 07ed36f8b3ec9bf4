"""Benchmark: frisys (HB-PP factorized FCI-FRI) iteration throughput on the
flagship N2/cc-pVDZ-sized configuration.

Metric (BASELINE.json): sampled H*v nonzeros per second per chip at 1e6 kept
determinants.  The reference publishes no wall-clock numbers (BASELINE.md);
vs_baseline is the speedup over a single-rank run of the same algorithm's
C++ reference implementation on this host's CPU (baseline_cpp/baseline.json).

Prints ONE JSON line.  Runs on the default JAX platform (the real TPU chip
under axon); set FRIES_BENCH_SMALL=1 for a scaled-down smoke run.

A TPU device fault poisons the whole client process, so in full mode each
size rung runs in its own subprocess and the first to succeed wins.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# persistent compile cache: TPU-tunnel compiles of the full step take minutes
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import numpy as np  # noqa: E402

# North-star rung first: the 1e6 config runs clean since the round-2 memory
# fixes (f32 stage rows, chunked comp_sub emission).  Measured 2026-08-16
# (round 2): 1e6 -> 4.28 s/iter = 233.7k nonzeros/s (vs 8.2 s/iter at 500k
# in round 1); 500k -> 2.03 s/iter = 245.9k nonzeros/s.
# spawn_cap = matr_samp + small slack: a comp_sub level emits at most n_samp
# rows (kept subs consume budget units and grid hits partition the remaining
# budget exactly, compress.py comp_sub), so the old 1.4x pad only inflated
# every per-sample buffer in the spawner and the merge's spawn stream by 40%.
# Single-chip exact; the overflow flag aborts loudly if ever violated.
FULL_LADDER = [
    ("1e6", 1_000_000, 1_000_000, 1 << 21, 1_032_768, 2, 5),
    ("500k", 500_000, 500_000, 1 << 20, 532_768, 2, 5),
    ("125k", 125_000, 125_000, 1 << 18, 157_768, 2, 5),
]


def _orchestrate():
    for i in range(len(FULL_LADDER)):
        env = dict(os.environ)
        env["FRIES_BENCH_RUNG"] = str(i)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True,
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("{")), None
        )
        if line:
            print(line)
            return
        sys.stderr.write(
            f"# rung {FULL_LADDER[i][0]} failed\n" + proc.stderr[-500:] + "\n"
        )
    raise SystemExit("all benchmark rungs failed")


def _time_steady(run_steps, state, args, n_warm, n_time, fetch):
    """Steady-state timing: warm up with the same static scan length, then
    time one block; ``fetch(metrics)`` must force a scalar device->host sync
    (block_until_ready returns early under the axon tunnel)."""
    for _ in range(n_warm):
        state, m = run_steps(state, *args, n_time) if args else run_steps(state, n_time)
    fetch(m)
    t0 = time.perf_counter()
    state, m = run_steps(state, *args, n_time) if args else run_steps(state, n_time)
    fetch(m)
    return (time.perf_counter() - t0) / n_time, m


def _emit(payload):
    print(json.dumps(payload))


def _real_or_synth(real_name, synth_fn, real_label, synth_label):
    """Real-molecule Hamiltonian from tools/real_systems (round-5 default),
    synthetic fallback behind FRIES_BENCH_SYNTH=1 or on build failure."""
    if not os.environ.get("FRIES_BENCH_SYNTH"):
        try:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tools"))
            import real_systems
            return getattr(real_systems, real_name)(), real_label
        except Exception as e:  # pragma: no cover
            sys.stderr.write(f"# real {real_name} failed ({e}); synthetic\n")
    return synth_fn(), synth_label


def bench_frifull_hh():
    """BASELINE.md required config: frifull_hh, 4-site Hubbard-Holstein
    (exact H*v, systematic vector compression)."""
    from fries_tpu.ops import hubbard as hub
    from fries_tpu.drivers import frifull_hh, power

    ham = hub.HubbardHolstein(
        n_sites=4, n_elec=4, ph_bits=3, u=2.0, omega=1.0, g=0.5
    )
    cfg = power.PowerConfig(
        eps=0.01, target_nonz=30_000, capacity=1 << 17, target_norm=60_000.0
    )
    step, run_steps, state, aux = frifull_hh.build(
        ham, e_ref=0.0, cfg=cfg, seed=0
    )
    args = (aux["num_keys"], aux["num_vals"], aux["den_keys"],
            aux["den_vals"], aux["ref_key"])
    sec, m = _time_steady(
        run_steps, state, args, 3, 10,
        lambda m: float(np.asarray(m["norm"]).reshape(-1)[-1]),
    )
    _emit({
        "metric": "frifull_hh iterations/sec (4-site Hubbard-Holstein, "
                  "ph_bits=3, 30k kept)",
        "value": round(1.0 / sec, 3), "unit": "iters/s", "vs_baseline": 0.0,
        "ms_per_iter": round(sec * 1e3, 2),
        "n_dets_final": int(np.asarray(m["n_dets"]).reshape(-1)[-1]),
    })


def bench_frifull_mol():
    """BASELINE.md required config: frifull_mol, exact H application (every
    connected excitation per kept det).

    A (14 orb, 6 elec) system: its full FCI space (132 496 dets) fits the
    arena, so the uncompressed H*v support never overflows - the same
    regime the reference's frifull H2O runs occupy (H*v support bounded by
    max_size, frifull_mol.cpp). spawn_rows bounds the candidate buffer to
    the occupied arena prefix (49k rows x ~1.5k excitations)."""
    from fries_tpu import synth
    from fries_tpu.drivers import frifull, power

    def _h2o_cas():
        # real H2O/cc-pVDZ integrals in a (10e, 14o) active space: the
        # exact-H driver stores the uncompressed H*v support, so the full
        # FCI space must fit the arena (the reference's max_size bound,
        # frifull_mol.cpp) - C(14,5)^2 = 4e6 dets
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        import real_systems
        full = real_systems.h2o_ccpvdz()
        k = 12  # (10e, 12o): FCI dim 792^2 = 627k fits the 2^21 arena
        from fries_tpu.ops import molecule as mol
        return mol.MolecularHamiltonian(
            hcore=full.hcore[:k, :k], eris=full.eris[:k, :k, :k, :k],
            symm=full.symm[:k], n_orb=k, n_elec=full.n_elec,
            n_frozen=full.n_frozen)

    ham, sys_label = (
        synth.make_system(14, 6, seed=1, scale_two=0.1),
        "14-orb/6-elec synthetic")
    if not os.environ.get("FRIES_BENCH_SYNTH"):
        try:
            ham = _h2o_cas()
            sys_label = "real H2O/cc-pVDZ (10e,14o) CAS"
        except Exception as e:
            sys.stderr.write(f"# real H2O CAS failed ({e}); synthetic\n")
    cfg = power.PowerConfig(
        eps=0.005, target_nonz=30_000,
        capacity=1 << 21 if sys_label.startswith("real") else 1 << 18,
        target_norm=60_000.0, batch=1024, spawn_rows=49_152,
        dedup_cap=1 << 19 if sys_label.startswith("real") else 0,
    )
    step, run_steps, state, aux = frifull.build(ham, cfg, seed=0)
    args = (aux["num_keys"], aux["num_vals"], aux["den_keys"],
            aux["den_vals"], aux["ref_key"])
    sec, m = _time_steady(
        run_steps, state, args, 2, 3,
        lambda m: float(np.asarray(m["norm"]).reshape(-1)[-1]),
    )
    overflow = bool(np.asarray(m["overflow"]).any())
    _emit({
        "metric": f"frifull_mol iterations/sec ({sys_label}, "
                  "exact H, 30k kept dets)",
        "value": round(1.0 / sec, 4), "unit": "iters/s", "vs_baseline": 0.0,
        "ms_per_iter": round(sec * 1e3, 1),
        "n_dets_final": int(np.asarray(m["n_dets"]).reshape(-1)[-1]),
        "overflow": overflow,
    })


def bench_fciqmc():
    """BASELINE.md required config: fciqmc_mol at production walker counts
    (real stretched N2/cc-pVDZ r=4.2, heat-bath distribution, 5M walkers -
    the scale proof VERDICT round-2 item 9 asks for)."""
    from fries_tpu import synth
    from fries_tpu.drivers import fciqmc

    ham, sys_label = _real_or_synth(
        "n2_stretched", lambda: synth.n2_ccpvdz_like(seed=2),
        "real stretched N2/cc-pVDZ", "N2-stretched-size synthetic")
    att_chunk = int(os.environ.get("FRIES_FCIQMC_CHUNK", 1 << 20))
    cfg = fciqmc.FciqmcConfig(
        eps=1e-3, target_walkers=5_000_000.0, capacity=1 << 21,
        attempt_cap=1 << 23, attempt_chunk=att_chunk, spawn_cap=1 << 22,
        distribution="HB", integer_walkers=True, init_thresh=3.0,
        # deadbeat norm control: damp/(interval*eps)*ln(growth) == the
        # instantaneous growth-rate energy, so one update locks the
        # population at its activation size (~target).  The default 0.05
        # removes only 5% of the log-growth per window - with this
        # synthetic system's ~30 Ha spectral range the population blew
        # past every buffer before the shift caught up (measured 35.4M
        # walkers and an overflow at 75 iterations, 2026-08-19).
        shift_damping=1.0,
    )
    # start the population at scale (the reference grows 50M walkers over
    # ~1e5 CPU iterations, fciqmc_mol.cpp; the bench measures the steady
    # state, so seed 4M walkers on HF and let ~60 iterations spread them).
    # Blocks of scan(5): scan(20) programs at these shapes crash the v5e
    # worker (2026-08-18 bisect: step OK, scan(2) OK, scan(20) kernel
    # fault) - shorter scans sidestep the miscompile.
    step, run_steps, state, aux = fciqmc.build(
        ham, cfg, seed=0, init_walkers=4_000_000.0
    )
    args = (aux["num_keys"], aux["num_vals"], aux["den_keys"],
            aux["den_vals"], aux["ref_key"])
    for _ in range(12):
        state, m = run_steps(state, *args, 5)
    walkers = float(np.asarray(m["norm"]).reshape(-1)[-1])
    sec, m = _time_steady(
        run_steps, state, args, 1, 5,
        lambda m: float(np.asarray(m["norm"]).reshape(-1)[-1]),
    )
    walkers = float(np.asarray(m["norm"]).reshape(-1)[-1])
    overflow = bool(np.asarray(m["overflow"]).any())
    e_est = (float(np.asarray(m["proj_num"]).reshape(-1)[-1])
             / float(np.asarray(m["proj_den"]).reshape(-1)[-1]))
    _emit({
        "metric": f"fciqmc_mol iterations/sec ({sys_label}, "
                  "HB, 5M-walker target)",
        "value": round(1.0 / sec, 3), "unit": "iters/s", "vs_baseline": 0.0,
        "ms_per_iter": round(sec * 1e3, 2),
        "walkers": round(walkers, 0),
        "ns_per_walker_iter": round(sec / max(walkers, 1) * 1e9, 3),
        "overflow": overflow, "e_proj_finite": bool(np.isfinite(e_est)),
    })


def bench_subsp_sharded():
    """BASELINE.md required config: subsp_mol, Ne-sized multi-state,
    hash-sharded code path (1-device mesh on the single available chip;
    the 8-virtual-device equivalence is covered by tests/dryrun)."""
    import jax
    import jax.numpy as jnp
    from fries_tpu import dets, parallel, synth
    from fries_tpu.drivers import subspace
    from fries_tpu.ops import molecule as mol

    subsp_sys = os.environ.get("FRIES_SUBSP_SYSTEM", "ne_ccpvqz")
    ham, sys_label = _real_or_synth(
        subsp_sys, lambda: synth.ne_augccpvdz_like(seed=1),
        f"real {subsp_sys}", "Ne-size synthetic")
    hf_words, hf_occ, _ = mol.hf_reference(ham)
    if sys_label.startswith("real"):
        # symmetry-allowed single: highest occupied -> first same-irrep virt
        symm = np.asarray(ham.symm)
        half = ham.n_elec // 2
        o = half - 1
        v = next(i for i in range(half, ham.n_orb) if symm[i] == symm[o])
        d1, _ = dets.single_parity(
            hf_words[None], jnp.asarray([o]), jnp.asarray([v]))
    else:
        d1, _ = dets.single_parity(
            hf_words[None], jnp.asarray([4]), jnp.asarray([10])
        )
    t = 2
    tk = np.tile(np.asarray(dets.invalid_det(ham.n_words)), (t, 1, 1))
    tv = np.zeros((t, 1))
    tk[0, 0] = np.asarray(hf_words)
    tv[0, 0] = 1.0
    tk[1, 0] = np.asarray(d1)[0]
    tv[1, 0] = 1.0
    n_dev = 1
    mesh = parallel.make_mesh(n_dev)
    cfg = subspace.SubspaceConfig(
        eps=0.02, n_trial=t, vec_nonz=100_000, matr_samp=200_000,
        capacity=1 << 19, spawn_cap=300_000, restart_int=10,
        axis_name=parallel.AXIS, n_shards=n_dev, exchange_cap=600_000,
    )
    step, run_steps, state, aux = subspace.build_sharded(
        ham, cfg, jnp.asarray(tk), jnp.asarray(tv), seed=0, mesh=mesh
    )
    sec, m = _time_steady(
        run_steps, state, None, 3, 5,
        lambda m: float(np.asarray(m["norms"]).reshape(-1)[-1]),
    )
    _emit({
        "metric": f"subsp_mol iterations/sec ({sys_label}, 2 states, "
                  "hash-sharded path, 100k kept/vector)",
        "value": round(1.0 / sec, 3), "unit": "iters/s", "vs_baseline": 0.0,
        "ms_per_iter": round(sec * 1e3, 1),
        "sampled_nonzeros_per_sec": round(t * cfg.matr_samp / sec, 1),
    })


CONFIGS = {
    "frifull_hh": bench_frifull_hh,
    "frifull_mol": bench_frifull_mol,
    "fciqmc": bench_fciqmc,
    "subsp": bench_subsp_sharded,
}


def main():
    small = bool(os.environ.get("FRIES_BENCH_SMALL"))
    which = os.environ.get("FRIES_BENCH_CONFIG")
    if which and which != "frisys":
        return CONFIGS[which]()
    if os.environ.get("FRIES_BENCH_RUNG") is None and not small:
        return _orchestrate()

    import jax
    from fries_tpu import synth
    from fries_tpu.drivers import frisys

    if small:
        label, vec_nonz, matr_samp, cap, spawn_cap, n_warm, n_time = (
            "small", 2000, 4000, 1 << 13, 6000, 2, 5,
        )
        ham = synth.make_system(10, 6, seed=1)
    else:
        rung = int(os.environ.get("FRIES_BENCH_RUNG", "0"))
        label, vec_nonz, matr_samp, cap, spawn_cap, n_warm, n_time = FULL_LADDER[rung]
        if os.environ.get("FRIES_BENCH_SYNTH"):
            ham = synth.n2_ccpvdz_like(seed=1)
            sys_label = "N2-ccpvdz-size synthetic"
        else:
            # the real molecule (round-5): N2/cc-pVDZ from the in-repo
            # integrals/RHF pipeline, frozen core, HF trial - the exact
            # headline config BASELINE.json names.  Falls back to the
            # synthetic if the cache build fails (e.g. no scipy).
            try:
                sys.path.insert(
                    0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tools"))
                import real_systems
                ham = real_systems.n2_ccpvdz()
                sys_label = "real N2/cc-pVDZ (frozen core)"
            except Exception as e:  # pragma: no cover
                sys.stderr.write(f"# real N2 build failed ({e}); synthetic\n")
                ham = synth.n2_ccpvdz_like(seed=1)
                sys_label = "N2-ccpvdz-size synthetic"

    cfg = frisys.FrisysConfig(
        eps=0.001, vec_nonz=vec_nonz, matr_samp=matr_samp, capacity=cap,
        spawn_cap=spawn_cap, target_norm=2.0 * vec_nonz,
    )
    step, run_steps, state, aux = frisys.build(ham, cfg, seed=0)
    args = (
        aux["num_keys"], aux["num_vals"], aux["den_keys"], aux["den_vals"],
        aux["ref_key"],
    )

    # warmup: same static scan length as the timed region (a different n_iter
    # would trigger a recompile inside the timing), repeated to reach a
    # steady-state population.  Timing fetches a scalar to host:
    # block_until_ready has been observed returning early under the axon
    # tunnel, yielding nonsense wall-clock numbers.
    for _ in range(n_warm):
        state, m = run_steps(state, *args, n_time)
    float(np.asarray(m["norm"]).reshape(-1)[-1])

    # best-of-N with dispersion: round-3 numbers moved 3.28x -> 4.5x with no
    # code change after a TPU worker restart (PLAN.md session-3), so a single
    # timing block is not comparable across rounds.  Record every rep.
    rep_secs = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = run_steps(state, *args, n_time)
        float(np.asarray(m["norm"]).reshape(-1)[-1])
        rep_secs.append((time.perf_counter() - t0) / n_time)
    dt = min(rep_secs) * n_time

    iters_per_sec = n_time / dt
    nonzeros_per_sec = matr_samp * iters_per_sec

    baseline_file = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "baseline_cpp", "baseline.json"
    )
    vs_baseline = 0.0
    vs_synth = None
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            base = json.load(f)
        if base.get("nonzeros_per_sec"):
            vs_baseline = nonzeros_per_sec / base["nonzeros_per_sec"]
        # continuity with rounds 1-4, whose denominator was the C1
        # synthetic FCIDUMP baseline (~1.6x slower than the real-system
        # C++ because C1 defeats the reference's symmetry pruning)
        synth_base = (base.get("synthetic_baseline") or {}).get(
            "nonzeros_per_sec")
        if synth_base:
            vs_synth = nonzeros_per_sec / synth_base

    print(
        json.dumps(
            {
                "metric": "sampled H*v nonzeros/sec/chip, frisys HB-PP, "
                f"{'small synthetic' if small else sys_label}, "
                f"{label} kept dets"
                + (" (SMALL smoke config)" if small else ""),
                "value": round(nonzeros_per_sec, 1),
                "unit": "nonzeros/s",
                "vs_baseline": round(vs_baseline, 3),
                **({"vs_baseline_synthetic_r4_denominator":
                    round(vs_synth, 3)} if vs_synth else {}),
                "iters_per_sec": round(iters_per_sec, 4),
                "n_dets_final": int(np.asarray(m["n_dets"]).reshape(-1)[-1]),
                "reps_ms_per_iter": [round(s * 1e3, 1) for s in rep_secs],
                "rep_spread": round(
                    (max(rep_secs) - min(rep_secs)) / min(rep_secs), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
