"""Multi-state subspace iteration tests vs dense diagonalization."""

import numpy as np
import jax.numpy as jnp
import pytest

import dense_fci
from fries_tpu import dets, linalg
from fries_tpu.drivers import subspace
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
    """Truncated exact eigenvectors as trial states (reference loads Dice/SHCI
    vectors, subsp_mol.cpp:197-235)."""
    t_keys = []
    t_vals = []
    for j in range(n_states):
        vec = evecs[:, j]
        top = np.argsort(-np.abs(vec))[:n_keep]
        keys = np.stack(
            [dense_fci.mask_to_words(basis[i], ham.n_bits) for i in top]
        )
        t_keys.append(keys)
        t_vals.append(vec[top])
    return jnp.asarray(np.stack(t_keys)), jnp.asarray(np.stack(t_vals))


def test_subspace_two_states(system):
    ham, dense_h, basis, evals, evecs = system
    t_keys, t_vals = make_trials(ham, basis, evecs, 2, 12)
    cfg = subspace.SubspaceConfig(
        eps=0.05, n_trial=2, vec_nonz=60, matr_samp=250, capacity=160,
        spawn_cap=1024, restart_int=10,
    )
    step, run_steps, state, aux = subspace.build(ham, cfg, t_keys, t_vals, seed=3)
    state, traj = run_steps(state, 1200)
    assert not bool(np.asarray(traj["overflow"]).any())
    energies = linalg.subspace_energies(
        traj["h_mat"], traj["d_mat"], burn_in=400
    ) + float(aux["e_ref"])
    # ground and first excited state
    assert abs(energies[0] - evals[0]) < 0.05, (energies, evals[:2])
    assert abs(energies[1] - evals[1]) < 0.08, (energies, evals[:2])


def test_subspace_deterministic_budgets(system):
    """With budgets exceeding the Hilbert-space and path counts the subspace
    iteration is deterministic and the projected energies are exact."""
    ham, dense_h, basis, evals, evecs = system
    t_keys, t_vals = make_trials(ham, basis, evecs, 2, 8)
    cfg = subspace.SubspaceConfig(
        eps=0.05, n_trial=2, vec_nonz=512, matr_samp=60000, capacity=128,
        spawn_cap=16384, restart_int=10,
    )
    step, run_steps, state, aux = subspace.build(ham, cfg, t_keys, t_vals, seed=0)
    state, traj = run_steps(state, 250)
    assert not bool(np.asarray(traj["overflow"]).any())
    h_last = np.asarray(traj["h_mat"])[-1]
    d_last = np.asarray(traj["d_mat"])[-1]
    evals_sub, _ = linalg.gen_eig(h_last, d_last)
    got = np.sort(evals_sub.real) + float(aux["e_ref"])
    np.testing.assert_allclose(got[0], evals[0], atol=2e-3)
    np.testing.assert_allclose(got[1], evals[1], atol=2e-2)


def test_subspfull_exact_h(system):
    """subspfull_mol analogue: exact H application, deterministic budgets."""
    ham, dense_h, basis, evals, evecs = system
    t_keys, t_vals = make_trials(ham, basis, evecs, 2, 8)
    cfg = subspace.SubspaceConfig(
        eps=0.05, n_trial=2, vec_nonz=512, matr_samp=1024, capacity=128,
        spawn_cap=1024, restart_int=10, exact_h=True,
    )
    step, run_steps, state, aux = subspace.build(ham, cfg, t_keys, t_vals, seed=0)
    state, traj = run_steps(state, 250)
    assert not bool(np.asarray(traj["overflow"]).any())
    h_last = np.asarray(traj["h_mat"])[-1]
    d_last = np.asarray(traj["d_mat"])[-1]
    evals_sub, _ = linalg.gen_eig(h_last, d_last)
    got = np.sort(evals_sub.real) + float(aux["e_ref"])
    np.testing.assert_allclose(got[0], evals[0], atol=1e-5)
    np.testing.assert_allclose(got[1], evals[1], atol=1e-3)


def test_norm_relative_initiator(system):
    """With a huge init_thresh the norm-relative cutoff marks every stochastic
    spawn non-initiator; spawns onto unoccupied determinants are then dropped
    by the arena accumulate, so the index set can never grow beyond the trial
    support (subsp_mol.cpp:522-523 semantics)."""
    ham, dense_h, basis, evals, evecs = system
    t_keys, t_vals = make_trials(ham, basis, evecs, 2, 12)
    cfg = subspace.SubspaceConfig(
        eps=0.05, n_trial=2, vec_nonz=60, matr_samp=250, capacity=160,
        spawn_cap=1024, restart_int=10, init_thresh=1e9,
    )
    step, run_steps, state, aux = subspace.build(ham, cfg, t_keys, t_vals, seed=3)
    n0 = int(np.asarray(state.arena.n_used).reshape(-1)[0])
    state, traj = run_steps(state, 40)
    n_dets = np.asarray(traj["n_dets"]).reshape(-1)
    assert n_dets.max() <= n0

    # init_thresh=0 (all initiators) must grow the set for the same seed
    cfg0 = subspace.SubspaceConfig(
        eps=0.05, n_trial=2, vec_nonz=60, matr_samp=250, capacity=160,
        spawn_cap=1024, restart_int=10, init_thresh=0.0,
    )
    step0, run_steps0, state0, _ = subspace.build(ham, cfg0, t_keys, t_vals, seed=3)
    state0, traj0 = run_steps0(state0, 40)
    assert np.asarray(traj0["n_dets"]).reshape(-1).max() > n0


def test_lowmem_hmat_matches_stored(system):
    """subsp_mol_lowmem: on-the-fly <trial|H|v> (calc_h_dot,
    molecule.cpp:667-885) equals the stored-H*trial projection."""
    ham, dense_h, basis, evals, evecs = system
    t_keys, t_vals = make_trials(ham, basis, evecs, 2, 12)
    common = dict(
        eps=0.05, n_trial=2, vec_nonz=60, matr_samp=250, capacity=160,
        spawn_cap=1024, restart_int=10,
    )
    cfg_a = subspace.SubspaceConfig(**common)
    cfg_b = subspace.SubspaceConfig(**common, lowmem=True)
    _, run_a, st_a, _ = subspace.build(ham, cfg_a, t_keys, t_vals, seed=5)
    _, run_b, st_b, _ = subspace.build(ham, cfg_b, t_keys, t_vals, seed=5)
    st_a, tr_a = run_a(st_a, 30)
    st_b, tr_b = run_b(st_b, 30)
    # identical seeds -> identical trajectories; h_mat must agree exactly
    np.testing.assert_allclose(
        np.asarray(tr_a["h_mat"]), np.asarray(tr_b["h_mat"]),
        rtol=1e-9, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(tr_a["d_mat"]), np.asarray(tr_b["d_mat"]), rtol=1e-12
    )


def test_subspace_compress_modes(system):
    """sys / piv / multi vector compression all converge on the 2-state
    problem (reference offers pivotal as the production default)."""
    ham, dense_h, basis, evals, evecs = system
    t_keys, t_vals = make_trials(ham, basis, evecs, 2, 12)
    for mode in ("sys", "multi"):
        cfg = subspace.SubspaceConfig(
            eps=0.05, n_trial=2, vec_nonz=60, matr_samp=250, capacity=160,
            spawn_cap=1024, restart_int=10, compress_mode=mode,
        )
        _, run_steps, state, aux = subspace.build(
            ham, cfg, t_keys, t_vals, seed=3
        )
        state, traj = run_steps(state, 1200)
        assert not bool(np.asarray(traj["overflow"]).any()), mode
        energies = linalg.subspace_energies(
            traj["h_mat"], traj["d_mat"], burn_in=400
        ) + float(aux["e_ref"])
        assert abs(energies[0] - evals[0]) < 0.05, (mode, energies)
