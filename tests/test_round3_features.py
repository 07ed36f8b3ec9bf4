"""Round-3 parity features: lowmem + time-reversal subspace, semistochastic
under sharding, and the CLI flag sweep (--trial_vec / --ini_vec / --ham_shift,
subspace 2-digit/.dice trial inputs, --out_format npy/bin, metric streams)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import dense_fci
from fries_tpu import cli, dets, io, parallel, synth
from fries_tpu.drivers import frisys, subspace
from fries_tpu.ops import molecule as mol


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(21)
    n_orb, n_elec = 5, 4
    h, eris = dense_fci.random_integrals(rng, n_orb)
    ham = mol.MolecularHamiltonian(
        hcore=jnp.asarray(h), eris=jnp.asarray(eris),
        symm=jnp.zeros(n_orb, jnp.int32), n_orb=n_orb, n_elec=n_elec,
    )
    dense_h, basis = dense_fci.build_hamiltonian(h, eris, n_orb, 2, 2)
    from scipy.linalg import eigh

    evals, evecs = eigh(dense_h)
    return ham, dense_h, basis, evals, evecs


def make_trials(ham, basis, evecs, n_states, n_keep):
    t_keys, t_vals = [], []
    for j in range(n_states):
        vec = evecs[:, j]
        top = np.argsort(-np.abs(vec))[:n_keep]
        keys = np.stack(
            [dense_fci.mask_to_words(basis[i], ham.n_bits) for i in top]
        )
        t_keys.append(keys)
        t_vals.append(vec[top])
    return jnp.asarray(np.stack(t_keys)), jnp.asarray(np.stack(t_vals))


def test_subspace_lowmem_time_reversal_matches_stored(system):
    """subsp_mol_lowmem --time_reversal (the reference lowmem driver shares
    subsp_mol's MyArgs incl. time_reversal): the on-the-fly folded
    <trial|H|v> must equal the stored folded-H*trial projection."""
    ham, dense_h, basis, evals, evecs = system
    t_keys, t_vals = make_trials(ham, basis, evecs, 2, 12)
    common = dict(
        eps=0.05, n_trial=2, vec_nonz=60, matr_samp=250, capacity=160,
        spawn_cap=1024, restart_int=10, spin_parity=1,
    )
    cfg_a = subspace.SubspaceConfig(**common)
    cfg_b = subspace.SubspaceConfig(**common, lowmem=True)
    _, run_a, st_a, _ = subspace.build(ham, cfg_a, t_keys, t_vals, seed=5)
    _, run_b, st_b, _ = subspace.build(ham, cfg_b, t_keys, t_vals, seed=5)
    st_a, tr_a = run_a(st_a, 30)
    st_b, tr_b = run_b(st_b, 30)
    np.testing.assert_allclose(
        np.asarray(tr_a["h_mat"]), np.asarray(tr_b["h_mat"]),
        rtol=1e-9, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(tr_a["d_mat"]), np.asarray(tr_b["d_mat"]), rtol=1e-12
    )


def test_sharded_semistochastic_full_space_exact(system):
    """Semistochastic + sharding (frisys_mol.cpp:347-401 runs the dense block
    on every MPI rank): full-space deterministic core on the 8-virtual-device
    mesh is an exact power method."""
    ham, dense_h, basis, evals, evecs = system
    e0 = evals[0]
    all_keys = np.stack(
        [dense_fci.mask_to_words(m, 2 * ham.n_orb) for m in basis]
    )
    determ = frisys.build_determ_block(ham, jnp.asarray(all_keys))
    n_dev = 8
    mesh = parallel.make_mesh(n_dev)
    cfg = frisys.FrisysConfig(
        eps=0.05, vec_nonz=128, matr_samp=determ["n_elements"] + 64,
        capacity=64, spawn_cap=4096, axis_name=parallel.AXIS,
        n_shards=n_dev, exchange_cap=2048,
    )
    step, run, state, aux = frisys.build_sharded(
        ham, cfg, seed=0, mesh=mesh, determ_keys=jnp.asarray(all_keys)
    )
    assert aux["protected_keys"] is not None
    state, traj = run(
        state, aux["num_keys"], aux["num_vals"], aux["den_keys"],
        aux["den_vals"], aux["ref_key"], 400, aux["protected_keys"],
    )
    assert not bool(np.asarray(traj["overflow"]).any())
    e_est = np.asarray(traj["proj_num"])[-1] / np.asarray(traj["proj_den"])[-1]
    np.testing.assert_allclose(float(aux["e_ref"]) + e_est, e0, atol=2e-4)


def _write_fcidump(tmp_path):
    ham = synth.make_system(5, 4, seed=2)
    fcid = str(tmp_path / "FCIDUMP")
    io.write_fcidump(ham, fcid)
    return ham, fcid


def test_cli_trial_ini_ham_shift(tmp_path):
    """frisys_mol --trial_vec/--ini_vec/--ham_shift (frisys_mol.cpp:27-33):
    flags accepted, files drive the estimator/start vector, streams parse."""
    ham, fcid = _write_fcidump(tmp_path)
    hf_words, hf_occ, hf_en = mol.hf_reference(ham)
    d1, _ = dets.single_parity(hf_words[None], jnp.asarray([1]), jnp.asarray([3]))
    tkeys = np.concatenate([np.asarray(hf_words)[None], np.asarray(d1)])
    tvals = np.asarray([1.0, 0.05])
    tpre = str(tmp_path / "tv_")
    io.save_vec_txt(tpre, tkeys, tvals, ham.n_bits)
    ipre = str(tmp_path / "iv_")
    io.save_vec_txt(ipre, tkeys, np.asarray([100.0, 1.0]), ham.n_bits)

    rdir = str(tmp_path / "run")
    cli.main([
        "frisys_mol", "--fcidump_path", fcid, "--epsilon", "0.05",
        "--vec_nonz", "60", "--mat_nonz", "200", "--max_dets", "512",
        "--max_iter", "4", "--save_interval", "4", "--target", "80",
        "--result_dir", rdir, "--seed", "3",
        "--trial_vec", tpre, "--ini_vec", ipre,
        "--ham_shift", repr(float(hf_en)),
    ])
    num = np.loadtxt(os.path.join(rdir, "projnum.txt"))
    den = np.loadtxt(os.path.join(rdir, "projden.txt"))
    assert np.isfinite(num).all() and len(num) == 4
    # the initial vector is the loaded one: the denominator at iteration 1
    # reflects <trial|ini> = 100*1 + 1*0.05, not the HF-only 100
    assert abs(den[0]) > 100.005 - 0.5


def test_cli_subspace_two_digit_npy_and_streams(tmp_path):
    """subsp_mol with reference <prefix>XXdets naming, --num_trial,
    --out_format npy, and the shifts/norms/n_ini streams
    (subsp_mol.cpp:202-204, 29, 366-380)."""
    ham, fcid = _write_fcidump(tmp_path)
    hf_words, hf_occ, _ = mol.hf_reference(ham)
    d1, _ = dets.single_parity(hf_words[None], jnp.asarray([1]), jnp.asarray([3]))
    pre = str(tmp_path / "trial")
    io.save_vec_txt(pre + "00", np.asarray(hf_words)[None],
                    np.asarray([1.0]), ham.n_bits)
    io.save_vec_txt(pre + "01", np.asarray(d1), np.asarray([1.0]), ham.n_bits)
    rdir = str(tmp_path / "srun")
    cli.main([
        "subsp_mol", "--fcidump_path", fcid, "--epsilon", "0.05",
        "--vec_nonz", "60", "--mat_nonz", "200", "--max_dets", "256",
        "--max_iter", "6", "--save_interval", "3", "--trial_vecs", pre,
        "--num_trial", "2", "--result_dir", rdir, "--seed", "5",
        "--out_format", "npy", "--initiator", "0.1",
    ])
    h = np.load(os.path.join(rdir, "h_mat.npy"))
    d = np.load(os.path.join(rdir, "d_mat.npy"))
    assert h.shape == (6, 2, 2) and d.shape == (6, 2, 2)
    assert np.isfinite(h).all() and np.isfinite(d).all()
    norms = np.loadtxt(os.path.join(rdir, "norms.txt"), delimiter=",")
    assert norms.shape == (6, 2) and (norms > 0).all()
    nini = np.loadtxt(os.path.join(rdir, "n_ini.txt"), delimiter=",")
    assert nini.shape == (6, 2) and (nini >= 0).all()
    # shift controller updates land every shift_interval (10) iterations:
    # none in 6 iterations, so shifts.txt exists and is empty
    assert os.path.exists(os.path.join(rdir, "shifts.txt"))


def test_cli_subspace_bin_format(tmp_path):
    """--out_format bin: raw f64 h_mat.dat/d_mat.dat records."""
    ham, fcid = _write_fcidump(tmp_path)
    hf_words, hf_occ, _ = mol.hf_reference(ham)
    pre = str(tmp_path / "trial")
    io.save_vec_txt(pre + "00", np.asarray(hf_words)[None],
                    np.asarray([1.0]), ham.n_bits)
    rdir = str(tmp_path / "brun")
    cli.main([
        "subsp_mol", "--fcidump_path", fcid, "--epsilon", "0.05",
        "--vec_nonz", "60", "--mat_nonz", "200", "--max_dets", "256",
        "--max_iter", "3", "--save_interval", "3", "--trial_vecs", pre,
        "--num_trial", "1", "--result_dir", rdir, "--seed", "5",
        "--out_format", "bin",
    ])
    h = np.fromfile(os.path.join(rdir, "h_mat.dat")).reshape(3, 1, 1)
    d = np.fromfile(os.path.join(rdir, "d_mat.dat")).reshape(3, 1, 1)
    assert np.isfinite(h).all() and np.isfinite(d).all()


def test_cli_subspace_dice_trial(tmp_path):
    """--trial_vecs file.dice loads Dice/SHCI-format trial vectors
    (subsp_mol.cpp:199-201)."""
    ham, fcid = _write_fcidump(tmp_path)
    # HF for (5 orb, 4 elec): orbitals 0,1 doubly occupied
    dice = tmp_path / "trial.dice"
    dice.write_text(
        "State :   0\n"
        "0  1.0  2 2 0 0 0\n"
        "State :   1\n"
        "0  0.9  2 a b 0 0\n"
        "1  0.1  2 b a 0 0\n"
    )
    rdir = str(tmp_path / "drun")
    cli.main([
        "subsp_mol", "--fcidump_path", fcid, "--epsilon", "0.05",
        "--vec_nonz", "60", "--mat_nonz", "200", "--max_dets", "256",
        "--max_iter", "3", "--save_interval", "3",
        "--trial_vecs", str(dice),
        "--num_trial", "2", "--result_dir", rdir, "--seed", "5",
    ])
    h = np.loadtxt(os.path.join(rdir, "h_mat.txt"), delimiter=",")
    assert h.shape == (3, 4) and np.isfinite(h).all()
