"""Symmetry-adapted restricted Hartree-Fock + Hamiltonian builder for
correlation-consistent bases.

Produces exactly what the reference consumes from PySCF (Input_Data/
gen_ex_trials.py; io_utils.cpp:98-187 parse_hf_input): canonical-MO core
Hamiltonian + physicist-notation ERIs + PySCF-convention irrep labels
(XOR-product abelian groups, io_utils.cpp convert_symm) + the electronic
HF energy.  The point-group machinery covers the sign-flip subgroups of
D2h the reference supports (D2h/C2v/C2h/D2/Cs/C2/Ci/C1).

MO phases and degenerate-pair mixing are arbitrary in any HF code; the
``match_reference`` helper aligns our orbitals with an existing reference
MO basis via its hcore matrix so externally-computed trial vectors (e.g.
the reference's Input_Data CISD vectors) can be reused directly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fries_tpu import gto
from fries_tpu.ops import molecule as mol

# D2h sign-flip operations (sx, sy, sz) in a fixed order
_ALL_OPS = [
    (1, 1, 1), (-1, -1, 1), (-1, 1, -1), (1, -1, -1),
    (-1, -1, -1), (1, 1, -1), (1, -1, 1), (-1, 1, 1),
]
_OP_NAMES = ["E", "C2z", "C2y", "C2x", "i", "sxy", "sxz", "syz"]


def symmetry_ops(centers, charges, ao_meta, tol=1e-7):
    """Detect the sign-flip point group and build signed-permutation AO
    representation matrices.

    Returns (op_signs, rep_mats): the subset of `_ALL_OPS` that maps the
    nuclear frame onto itself and, for each, the (nao, nao) matrix R_g with
    (R_g)_{ij} = ±1 if AO j maps onto AO i."""
    centers = np.atleast_2d(np.asarray(centers, float))
    nao = len(ao_meta)
    ops, mats = [], []
    for signs in _ALL_OPS:
        sv = np.asarray(signs, float)
        mapped = centers * sv
        perm = []
        ok = True
        for i in range(len(centers)):
            d = np.linalg.norm(centers - mapped[i], axis=1)
            j = int(np.argmin(d))
            if d[j] > tol or abs(charges[i] - charges[j]) > 1e-12:
                ok = False
                break
            perm.append(j)
        if not ok:
            continue
        # atom -> list of its AO indices, in order
        atom_aos = {}
        for idx, (atom, l, ci, par) in enumerate(ao_meta):
            atom_aos.setdefault(atom, []).append(idx)
        r = np.zeros((nao, nao))
        for idx, (atom, l, ci, par) in enumerate(ao_meta):
            tgt_atom = perm[atom]
            # same (l, component) position within the target atom's AO list
            src_list = atom_aos[atom]
            tgt_list = atom_aos[tgt_atom]
            tgt_idx = tgt_list[src_list.index(idx)]
            sign = (signs[0] ** par[0]) * (signs[1] ** par[1]) \
                * (signs[2] ** par[2])
            r[tgt_idx, idx] = sign
        ops.append(signs)
        mats.append(r)
    return ops, mats


def _irrep_id(op_signs, chars):
    """PySCF irrep ID from the character vector over ``op_signs``.

    Supports the abelian sign-flip groups; uses the PySCF XOR convention
    (D2h: ag..b3u = 0..7; C2v: a1,a2,b1,b2 = 0..3; etc.)."""
    ch = {s: c for s, c in zip(op_signs, chars)}

    def c(name):
        return ch.get(_ALL_OPS[_OP_NAMES.index(name)], None)

    n = len(op_signs)
    if n == 8:  # D2h
        code = {(1, 1, 1): 0, (1, -1, -1): 1, (-1, 1, -1): 2,
                (-1, -1, 1): 3}[(c("C2z"), c("C2y"), c("C2x"))]
        return code + (0 if c("i") > 0 else 4)
    if n == 4 and c("C2z") is not None and c("sxz") is not None:  # C2v(z)
        if c("C2z") > 0:
            return 0 if c("sxz") > 0 else 1
        return 2 if c("sxz") > 0 else 3
    if n == 4 and c("C2z") is not None and c("i") is not None:  # C2h
        if c("i") > 0:
            return 0 if c("C2z") > 0 else 1
        return 2 if c("C2z") > 0 else 3
    if n == 4:  # D2
        key = (c("C2z"), c("C2y"), c("C2x"))
        return {(1, 1, 1): 0, (1, -1, -1): 1, (-1, 1, -1): 2,
                (-1, -1, 1): 3}[key]
    if n == 2:
        other = [s for s in op_signs if s != (1, 1, 1)][0]
        return 0 if ch[other] > 0 else 1
    return 0  # C1


def rhf(s, hcore, eri_chem, n_elec, max_iter=200, tol=1e-11,
        sym_group=None, guess="gwh"):
    """Closed-shell RHF with DIIS.  Returns (C, mo_energy, e_elec).

    ``sym_group``: optional list of AO-basis point-group operation
    matrices; when given, the Fock matrix is group-averaged each
    iteration, constraining the SCF to the symmetric manifold (what the
    reference's PySCF runs do with symmetry=True).  ``guess``: "gwh"
    (generalized Wolfsberg-Helmholz; finds the bonded solution at
    stretched geometries where the bare core guess lands ~17 mEh high
    on N2 r=4.2) or "core"."""
    n_occ = n_elec // 2
    evals, evecs = np.linalg.eigh(s)
    x = evecs @ np.diag(evals ** -0.5) @ evecs.T
    nao = s.shape[0]
    d = np.zeros((nao, nao))
    if guess == "gwh":
        hd = np.diag(hcore)
        f = 0.5 * 1.75 * s * (hd[:, None] + hd[None, :])
        np.fill_diagonal(f, hd)
    else:
        f = hcore
    errs, focks = [], []
    e_el = 0.0
    mo_e = None
    c = None
    for it in range(max_iter):
        if sym_group is not None:
            f = sum(g.T @ f @ g for g in sym_group) / len(sym_group)
        fp = x.T @ f @ x
        mo_e, cp = np.linalg.eigh(fp)
        c = x @ cp
        d_new = 2.0 * c[:, :n_occ] @ c[:, :n_occ].T
        d = d_new
        g = (np.einsum("ijkl,kl->ij", eri_chem, d, optimize=True)
             - 0.5 * np.einsum("ikjl,kl->ij", eri_chem, d, optimize=True))
        f_new = hcore + g
        e_new = 0.5 * np.sum(d * (hcore + f_new))
        err = f_new @ d @ s - s @ d @ f_new
        errs.append(err)
        focks.append(f_new)
        if len(errs) > 8:
            errs.pop(0)
            focks.pop(0)
        converged = it > 1 and abs(e_new - e_el) < tol \
            and np.max(np.abs(err)) < 1e-8
        e_el = e_new
        if converged:
            break
        # DIIS extrapolation
        m = len(errs)
        if m > 1:
            b = -np.ones((m + 1, m + 1))
            b[m, m] = 0.0
            for i in range(m):
                for j in range(m):
                    b[i, j] = np.sum(errs[i] * errs[j])
            rhs = np.zeros(m + 1)
            rhs[m] = -1.0
            try:
                w = np.linalg.solve(b, rhs)[:m]
                f = sum(wi * fi for wi, fi in zip(w, focks))
            except np.linalg.LinAlgError:
                f = f_new
        else:
            f = f_new
    return c, mo_e, e_el


def purify_and_label(c, mo_e, s, op_signs, rep_mats, degen_tol=1e-7):
    """Rotate degenerate MOs onto symmetry-pure combinations and assign
    PySCF irrep IDs.  Returns (C_pure, irreps)."""
    nmo = c.shape[1]
    c = c.copy()
    # cluster by energy
    order = np.argsort(mo_e, kind="stable")
    assert np.all(order == np.arange(nmo))
    clusters = []
    start = 0
    for i in range(1, nmo + 1):
        if i == nmo or mo_e[i] - mo_e[start] > degen_tol:
            clusters.append((start, i))
            start = i
    weights = [1.0, np.pi, np.e, np.sqrt(2), np.sqrt(3), np.sqrt(5),
               np.sqrt(7), np.sqrt(11)][: len(rep_mats)]
    lam = sum(w * r for w, r in zip(weights, rep_mats))
    for a, b in clusters:
        if b - a == 1:
            continue
        blk = c[:, a:b]
        m = blk.T @ s @ lam @ blk
        m = 0.5 * (m + m.T)
        _, v = np.linalg.eigh(m)
        c[:, a:b] = blk @ v
    irreps = np.zeros(nmo, np.int32)
    for k in range(nmo):
        chars = []
        impure = False
        for r in rep_mats:
            val = float(c[:, k] @ s @ r @ c[:, k])
            chars.append(1 if val > 0 else -1)
            impure |= abs(abs(val) - 1.0) > 1e-9
        if impure:
            # finite SCF convergence leaks tiny cross-irrep components
            # (observed on stretched N2: char 0.999994).  Apply the exact
            # abelian projector onto the dominant irrep, P = prod_r
            # (I + s_r R_r)/2, then S-orthonormalize against same-irrep
            # MOs already processed; the energy perturbation is
            # O(impurity^2).
            vec = c[:, k].copy()
            for sgn, r in zip(chars, rep_mats):
                vec = 0.5 * (vec + sgn * (r @ vec))
            for j in range(k):
                if np.array_equal(irreps[j], _irrep_id(op_signs, chars)):
                    ov = float(c[:, j] @ s @ vec)
                    vec = vec - ov * c[:, j]
            nrm = float(vec @ s @ vec)
            if nrm < 0.25:
                raise RuntimeError(
                    f"MO {k} not symmetry-purifiable (projected norm "
                    f"{nrm:.3f})")
            c[:, k] = vec / np.sqrt(nrm)
            for r, want in zip(rep_mats, chars):
                val = float(c[:, k] @ s @ r @ c[:, k])
                if abs(val - want) > 1e-8:
                    raise RuntimeError(
                        f"MO {k} impure after projection (char {val:.8f})")
        irreps[k] = _irrep_id(op_signs, chars)
    # PySCF orders exactly-degenerate MOs by ascending irrep ID (observed in
    # the reference's symm.txt: N2 pi pairs "6 7", Ne p triples "5 6 7")
    for a, b in clusters:
        if b - a > 1:
            order = np.argsort(irreps[a:b], kind="stable")
            c[:, a:b] = c[:, a + order]
            irreps[a:b] = irreps[a + order]
    return c, irreps


def build_molecule(symbols, centers, basis="cc-pvdz", n_frozen=0,
                   spherical=True):
    """Geometry -> (MolecularHamiltonian, info dict).

    The Hamiltonian keeps frozen orbitals inside hcore/eris with the
    ``n_frozen`` field set (the reference's convention: parse_hf_input
    io_utils.cpp:98-187 + frozen-core sums in sing_matr_el/diag_matrel).
    info: e_elec (reference sys_params hf_energy), e_nuc, e_hf_total,
    mo_energy, irreps (all orbitals), C (AO->MO)."""
    centers = np.atleast_2d(np.asarray(centers, float))
    s, t, v, eri, e_nuc, ao_meta = gto.integrals_cc(
        symbols, centers, basis, spherical=spherical)
    from fries_tpu import basis as basis_data
    charges = np.asarray([basis_data.get_shells(basis, sym)[0]
                          for sym in symbols], float)
    n_elec = int(charges.sum())
    hcore_ao = t + v
    op_signs, rep_mats = symmetry_ops(centers, charges, ao_meta)
    # full abelian group from the generator reps (for the symmetry-
    # constrained SCF; PySCF symmetry=True equivalent)
    group = [np.eye(s.shape[0])]
    for r_m in rep_mats:
        group = group + [g @ r_m for g in group]
    uniq = []
    for g in group:
        if not any(np.allclose(g, u) for u in uniq):
            uniq.append(g)
    c, mo_e, e_elec = rhf(s, hcore_ao, eri, n_elec, sym_group=uniq)
    c, irreps = purify_and_label(c, mo_e, s, op_signs, rep_mats)
    ham, info = _ham_from_mos(hcore_ao, eri, c, irreps, n_elec, n_frozen)
    info.update(e_elec=e_elec, e_nuc=e_nuc, e_hf_total=e_elec + e_nuc,
                mo_energy=mo_e)
    return ham, info


def _ham_from_mos(hcore_ao, eri_ao_chem, c, irreps, n_elec, n_frozen):
    """Transform to the MO basis and wrap as MolecularHamiltonian."""
    hmo = c.T @ hcore_ao @ c
    eri_mo = np.einsum("ijkl,ip,jq,kr,ls->pqrs", eri_ao_chem, c, c, c, c,
                       optimize=True)
    eri_phys = np.ascontiguousarray(np.transpose(eri_mo, (0, 2, 1, 3)))
    tot_orb = hmo.shape[0]
    n_frz_orb = n_frozen // 2
    ham = mol.MolecularHamiltonian(
        hcore=jnp.asarray(hmo),
        eris=jnp.asarray(eri_phys),
        symm=jnp.asarray(np.asarray(irreps[n_frz_orb:], np.int32)),
        n_orb=tot_orb - n_frz_orb,
        n_elec=n_elec - n_frozen,
        n_frozen=n_frozen,
    )
    info = {"C": c, "irreps": irreps, "hcore_mo": hmo}
    return ham, info


def match_reference(hmo_ours, hmo_ref, mo_e, irreps, ref_irreps=None,
                    degen_tol=1e-7, rtol=1e-6):
    """Align our MO basis with a reference MO basis via its hcore matrix.

    Returns (perm, U, err) such that ``C[:, perm] @ U`` reproduces the
    reference orbitals: the permutation only swaps (near-)degenerate
    orbitals — matched by irrep label against ``ref_irreps`` when given
    (degenerate partners, e.g. pi_x/pi_y, have symmetry-identical hcore
    diagonals so only the irrep distinguishes them), by hcore diagonal
    otherwise — and U is orthogonal and block-diagonal over degenerate
    same-irrep groups (±1 phases for singletons).  Raises if the two bases
    differ by more than that gauge freedom (i.e. the integrals genuinely
    disagree)."""
    n = hmo_ours.shape[0]
    perm = np.arange(n)
    start = 0
    for i in range(1, n + 1):
        if i == n or mo_e[i] - mo_e[start] > degen_tol:
            if i - start > 1:
                used = []
                if ref_irreps is not None:
                    ours_ir = [int(irreps[k]) for k in range(start, i)]
                    for k in range(start, i):
                        want = int(ref_irreps[k])
                        j = next(jj for jj, ir in enumerate(ours_ir)
                                 if ir == want and jj not in used)
                        used.append(j)
                else:
                    ours = np.array([hmo_ours[k, k]
                                     for k in range(start, i)])
                    refs = np.array([hmo_ref[k, k] for k in range(start, i)])
                    for r in refs:
                        j = int(np.argmin(
                            [abs(o - r) if jj not in used else np.inf
                             for jj, o in enumerate(ours)]))
                        used.append(j)
                perm[start:i] = start + np.asarray(used)
            start = i
    h = hmo_ours[np.ix_(perm, perm)]
    # Alignment freedom after permutation: an orthogonal transform U that is
    # block-diagonal over (degenerate cluster) ∩ (same irrep) groups —
    # singleton blocks are ±1 phases, size-k blocks (e.g. the two ag members
    # of an atomic d shell) are O(k) rotations that no symmetry fixes.
    # Solve min ||U^T h U − href||_F by cyclic per-block orthogonal
    # Procrustes updates.  hcore is symmetry-block-diagonal, so only
    # *within-irrep* relative alignment is observable here; cross-irrep
    # phases must be fixed downstream (e.g. by matching CI coefficients).
    blocks = []
    start = 0
    for i in range(1, n + 1):
        if i == n or mo_e[i] - mo_e[start] > degen_tol:
            members = list(range(start, i))
            if ref_irreps is not None:
                by_ir = {}
                for k in members:
                    by_ir.setdefault(int(ref_irreps[k]), []).append(k)
                blocks.extend(sorted(by_ir.values()))
            else:
                blocks.append(members)
            start = i
    u = np.eye(n)
    scale = np.max(np.abs(hmo_ref))
    # global phase initialization by spanning-tree sign propagation over the
    # significant reference off-diagonals: the cyclic per-block sweeps below
    # only flip one block at a time and can stall in a frustrated local
    # minimum when several phases are wrong simultaneously (observed after a
    # bit-level change in the AO transform's column scaling rounded the
    # degenerate eigenvectors differently)
    sgn = np.ones(n)
    thresh = 1e-4 * scale
    order = np.argsort(-np.abs(hmo_ref), axis=None)
    visited = np.zeros(n, bool)
    edges = [(i, j) for e in order
             for i, j in [divmod(int(e), n)] if i != j
             and abs(hmo_ref[i, j]) > thresh and abs(h[i, j]) > thresh]
    # hcore is symmetry-block-diagonal, so the significant-off-diagonal
    # graph is disconnected (one component per irrep block, plus isolated
    # rows): seed every component with +1 and propagate within it
    while not visited.all():
        visited[int(np.argmin(visited))] = True
        changed = True
        while changed:
            changed = False
            for i, j in edges:
                if visited[i] != visited[j]:
                    a, b = (i, j) if visited[i] else (j, i)
                    sgn[b] = sgn[a] * np.sign(h[i, j] * hmo_ref[i, j])
                    visited[b] = True
                    changed = True
    u = u * sgn[None, :]
    for sweep in range(60):
        cur = u.T @ h @ u
        err = np.max(np.abs(cur - hmo_ref))
        if err < 0.3 * rtol * scale and sweep > 1:
            break
        improved = False
        for blk in blocks:
            idx = np.asarray(blk)
            other = np.setdiff1d(np.arange(n), idx)
            hu = h @ u  # current columns
            x = (u[:, idx].T @ hu[:, other])  # (k, n-k) our couplings
            y = hmo_ref[np.ix_(idx, other)]
            m = x @ y.T
            uu, _, vv = np.linalg.svd(m)
            r = uu @ vv
            if np.max(np.abs(r - np.eye(len(idx)))) > 1e-12:
                u[:, idx] = u[:, idx] @ r
                improved = True
        if not improved:
            break
    aligned = u.T @ h @ u
    err = np.max(np.abs(aligned - hmo_ref))
    if err > rtol * scale:
        raise RuntimeError(
            f"MO bases differ beyond phase freedom: max|dh| = {err:.3e}")
    return perm, u, err
