"""Independent dense Hubbard-Holstein Hamiltonian (pure numpy).

Built directly from the model definition - hopping -t on nearest-neighbor
bonds (1-D open chain), on-site repulsion U, Einstein phonons omega, Holstein
coupling g * n_i (b_i + b_i^dag) - sharing no code with fries_tpu.ops.hubbard.
"""

from itertools import combinations, product

import numpy as np


def basis_states(n_sites, n_up, n_down, max_ph):
    ups = [frozenset(c) for c in combinations(range(n_sites), n_up)]
    downs = [frozenset(c) for c in combinations(range(n_sites), n_down)]
    phs = list(product(range(max_ph + 1), repeat=n_sites))
    return [(u, d, p) for u in ups for d in downs for p in phs]


def build_hamiltonian(n_sites, n_up, n_down, max_ph, t, u_int, omega, g):
    basis = basis_states(n_sites, n_up, n_down, max_ph)
    index = {s: i for i, s in enumerate(basis)}
    dim = len(basis)
    ham = np.zeros((dim, dim))
    for col, (up, down, ph) in enumerate(basis):
        # diagonal
        n_doub = len(up & down)
        ham[col, col] += u_int * n_doub + omega * sum(ph)
        # hopping
        for occ_set in (up, down):
            other = down if occ_set is up else up
            for i in range(n_sites - 1):
                for frm, to in ((i, i + 1), (i + 1, i)):
                    if frm in occ_set and to not in occ_set:
                        new_set = frozenset(occ_set - {frm} | {to})
                        new_state = (
                            (new_set, down, ph) if occ_set is up else (up, new_set, ph)
                        )
                        ham[index[new_state], col] += -t
        # Holstein coupling g * n_i (b + b^dag)
        for i in range(n_sites):
            n_i = (i in up) + (i in down)
            if n_i == 0:
                continue
            if ph[i] > 0:
                new_ph = tuple(p - (j == i) for j, p in enumerate(ph))
                ham[index[(up, down, new_ph)], col] += g * n_i * np.sqrt(ph[i])
            if ph[i] < max_ph:
                new_ph = tuple(p + (j == i) for j, p in enumerate(ph))
                ham[index[(up, down, new_ph)], col] += g * n_i * np.sqrt(ph[i] + 1)
    return ham, basis


def state_to_mask(state, n_sites, ph_bits):
    """Basis state -> bitmask int matching fries_tpu layout."""
    up, down, ph = state
    mask = 0
    for s in up:
        mask |= 1 << s
    for s in down:
        mask |= 1 << (s + n_sites)
    for site, num in enumerate(ph):
        mask |= num << (2 * n_sites + site * ph_bits)
    return mask
