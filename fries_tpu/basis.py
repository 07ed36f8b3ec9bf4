"""Correlation-consistent basis-set data (cc-pVDZ, aug-cc-pVDZ) for
H/N/O/Ne — the bases behind every headline system in the reference's
Benchmarks/Results.tex (N2 + H2O cc-pVDZ, Ne aug-cc-pVDZ).

The reference itself ships no basis data: it consumes PySCF-generated
integral files (Input_Data/gen_ex_trials.py shows the pipeline;
io_utils.cpp:98-187 parses the result).  This module + fries_tpu.gto make
the framework self-sufficient: geometry -> integrals -> RHF -> Hamiltonian.

Data layout: ``ELEMENTS[symbol] = (Z, [(l, [(exp, coef), ...]), ...])``
per basis name.  Values are the standard Dunning tabulations (Dunning,
JCP 90, 1007 (1989); Kendall et al., JCP 96, 6796 (1992) for the
augmentation); validated in tests/test_ccpvdz.py against the reference's
own surviving PySCF outputs (Input_Data/*/sys_params.txt hf_energy to
<=1e-6 Ha and the full MO-basis hcore.txt matrices).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# cc-pVDZ
# ---------------------------------------------------------------------------

# H: (4s,1p) -> [2s,1p]
_H_DZ = [
    (0, [(13.0100000, 0.0196850),
         (1.9620000, 0.1379770),
         (0.4446000, 0.4781480),
         (0.1220000, 0.5012400)]),
    (0, [(0.1220000, 1.0)]),
    (1, [(0.7270000, 1.0)]),
]

# N: (9s,4p,1d) -> [3s,2p,1d]; the two general s contractions are stored as
# separate shells sharing the exponent set.
_N_S_EXP = [9046.0000000, 1357.0000000, 309.3000000, 87.7300000, 28.5600000,
            10.2100000, 3.8380000, 0.7466000, 0.2248000]
_N_DZ = [
    (0, list(zip(_N_S_EXP, [0.0007000, 0.0053890, 0.0274060, 0.1032070,
                            0.2787230, 0.4485400, 0.2782380, 0.0154400,
                            -0.0028640]))),
    (0, list(zip(_N_S_EXP, [-0.0001530, -0.0012080, -0.0059920, -0.0245440,
                            -0.0674590, -0.1580780, -0.1218310, 0.5490030,
                            0.5788150]))),
    (0, [(0.2248000, 1.0)]),
    (1, [(13.5500000, 0.0399190),
         (2.9170000, 0.2171690),
         (0.7973000, 0.5103190),
         (0.2185000, 0.4622140)]),
    (1, [(0.2185000, 1.0)]),
    (2, [(0.8170000, 1.0)]),
]

_O_S_EXP = [11720.0000000, 1759.0000000, 400.8000000, 113.7000000,
            37.0300000, 13.2700000, 5.0250000, 1.0130000, 0.3023000]
_O_DZ = [
    (0, list(zip(_O_S_EXP, [0.0007100, 0.0054700, 0.0278370, 0.1048000,
                            0.2830620, 0.4487190, 0.2709520, 0.0154580,
                            -0.0025850]))),
    (0, list(zip(_O_S_EXP, [-0.0001600, -0.0012630, -0.0062670, -0.0257160,
                            -0.0709240, -0.1654110, -0.1169550, 0.5573680,
                            0.5727590]))),
    (0, [(0.3023000, 1.0)]),
    (1, [(17.7000000, 0.0430180),
         (3.8540000, 0.2289130),
         (1.0460000, 0.5087280),
         (0.2753000, 0.4605310)]),
    (1, [(0.2753000, 1.0)]),
    (2, [(1.1850000, 1.0)]),
]

_NE_S_EXP = [17880.0000000, 2683.0000000, 611.5000000, 173.5000000,
             56.6400000, 20.4200000, 7.8100000, 1.6530000, 0.4869000]
_NE_DZ = [
    (0, list(zip(_NE_S_EXP, [0.0007380, 0.0056770, 0.0288830, 0.1085400,
                             0.2909070, 0.4483240, 0.2580260, 0.0150630,
                             -0.0021000]))),
    # 2s contraction re-derived as the atomic-HF 2s orbital of the
    # uncontracted (9s4p) set (the Dunning construction; validated: the same
    # derivation reproduces the published 1s/2p rows to <5e-7)
    (0, list(zip(_NE_S_EXP, [-0.0001716, -0.0013570, -0.0067369, -0.0276633,
                             -0.0762077, -0.1752269, -0.1070382, 0.5670499,
                             0.5652162]))),
    (0, [(0.4869000, 1.0)]),
    (1, [(28.3900000, 0.0460870),
         (6.2700000, 0.2401810),
         (1.6950000, 0.5087440),
         (0.4317000, 0.4556600)]),
    (1, [(0.4317000, 1.0)]),
    (2, [(2.2020000, 1.0)]),
]

CCPVDZ = {
    "H": (1, _H_DZ),
    "N": (7, _N_DZ),
    "O": (8, _O_DZ),
    "Ne": (10, _NE_DZ),
}

# ---------------------------------------------------------------------------
# aug-cc-pVDZ: cc-pVDZ + one diffuse function per angular momentum
# ---------------------------------------------------------------------------

_AUG = {
    "H": [(0, 0.0297400), (1, 0.1410000)],
    "N": [(0, 0.0612400), (1, 0.0561100), (2, 0.2300000)],
    "O": [(0, 0.0789600), (1, 0.0685600), (2, 0.3320000)],
    "Ne": [(0, 0.1230000), (1, 0.1064000), (2, 0.6310000)],
}

AUG_CCPVDZ = {
    sym: (z, shells + [(l, [(e, 1.0)]) for l, e in _AUG[sym]])
    for sym, (z, shells) in CCPVDZ.items()
}

BASIS_SETS = {
    "cc-pvdz": CCPVDZ,
    "aug-cc-pvdz": AUG_CCPVDZ,
}


def get_shells(basis: str, symbol: str):
    """(Z, [(l, [(exp, coef), ...]), ...]) for ``symbol`` in ``basis``."""
    table = BASIS_SETS[basis.lower()]
    return table[symbol]
