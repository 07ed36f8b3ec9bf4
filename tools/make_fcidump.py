"""Generate real-molecule FCIDUMP files from the framework's own STO-3G
integrals (fries_tpu/gto.py) so any CLI workload can run on a real
molecule, mirroring the reference's FCIDUMP-driven production workflow
(io_utils.cpp:241-318; docs/running.dox):

    python tools/make_fcidump.py water --out /tmp/FCIDUMP_h2o
    python -m fries_tpu.cli frisys_mol --fcidump_path /tmp/FCIDUMP_h2o ...

Systems: water (7 orb / 10 e), n2 (10 orb / 14 e), lih (6 orb / 4 e),
h<N> chains (e.g. h10).  --frozen folds that many doubly-occupied core
MOs into the core energy before writing.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("system", help="water | n2 | lih | h<N> (H chain)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--r", type=float, default=None,
                    help="bond length (bohr); default per system")
    ap.add_argument("--frozen", type=int, default=0)
    args = ap.parse_args()

    from fries_tpu import gto, io, sto3g

    name = args.system.lower()
    if name == "water":
        ham, core = gto.water(n_frozen=args.frozen)
    elif name == "n2":
        ham, core = gto.n2(r=args.r or 2.074, n_frozen=args.frozen)
    elif name == "lih":
        ham, core = gto.lih(r=args.r or 3.015, n_frozen=args.frozen)
    elif name.startswith("h") and name[1:].isdigit():
        assert args.frozen == 0, "H chains have no core to freeze"
        ham, core = sto3g.h_chain(args.r or 1.8, int(name[1:]), basis="rhf")
    else:
        raise SystemExit(f"unknown system {args.system!r}")

    io.write_fcidump(ham, args.out, core_energy=core)
    print(f"wrote {args.out}: NORB={ham.n_orb} NELEC={ham.n_elec} "
          f"core={core:.9f}")


if __name__ == "__main__":
    main()
