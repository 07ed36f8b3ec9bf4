"""CLI checkpoint/resume: a killed run restarts from its checkpoint.npz
(reference frisys_mol.cpp:257-263 shift resume + DistVec::load)."""

import os

import numpy as np
import jax.numpy as jnp

from fries_tpu import synth, io, cli


def test_cli_resume(tmp_path):
    ham = synth.make_system(5, 4, seed=2)
    fcid = str(tmp_path / "FCIDUMP")
    io.write_fcidump(ham, fcid)
    rdir = str(tmp_path / "run")

    common = [
        "frisys_mol", "--fcidump_path", fcid, "--epsilon", "0.05",
        "--vec_nonz", "60", "--mat_nonz", "200", "--max_dets", "512",
        "--max_iter", "6", "--save_interval", "3", "--target", "80",
        "--result_dir", rdir, "--seed", "3",
    ]
    cli.main(common)
    with np.load(os.path.join(rdir, "checkpoint.npz")) as z:
        ck = {k: z[k].copy() for k in z.files}  # materialize before overwrite
    assert int(ck["iterat"]) == 6
    n_lines_first = len(open(os.path.join(rdir, "projnum.txt")).readlines())
    assert n_lines_first == 6

    cli.main(common + ["--load_dir", rdir])
    ck2 = np.load(os.path.join(rdir, "checkpoint.npz"))
    # resumed at 6, ran 6 more
    assert int(ck2["iterat"]) == 12
    # streams append across the restart (reference append-mode files)
    assert len(open(os.path.join(rdir, "projnum.txt")).readlines()) == 12
    # the resumed run continued from the checkpointed vector, not from scratch
    assert int(ck2["n_used"][0]) >= int(ck["n_used"][0]) // 2
    assert not np.array_equal(ck2["vals"], ck["vals"])


def test_cli_multichip(tmp_path):
    """--n_chips routes to the sharded build and runs on the virtual mesh."""
    from fries_tpu import synth, io, cli

    ham = synth.make_system(5, 4, seed=2)
    fcid = str(tmp_path / "FCIDUMP")
    io.write_fcidump(ham, fcid)
    rdir = str(tmp_path / "run8")
    cli.main([
        "frisys_mol", "--fcidump_path", fcid, "--epsilon", "0.05",
        "--vec_nonz", "60", "--mat_nonz", "200", "--max_dets", "128",
        "--max_iter", "4", "--save_interval", "4", "--target", "80",
        "--result_dir", rdir, "--seed", "3", "--n_chips", "8",
    ])
    num = np.loadtxt(os.path.join(rdir, "projnum.txt"))
    assert np.isfinite(num).all() and len(num) == 4


def test_cli_subspace_resume(tmp_path):
    """Subspace CLI checkpoints and resumes via --load_dir."""
    import jax.numpy as jnp
    from fries_tpu import synth, io, cli, dets
    from fries_tpu.ops import molecule as mol

    ham = synth.make_system(5, 4, seed=4)
    fcid = str(tmp_path / "FCIDUMP")
    io.write_fcidump(ham, fcid)
    # two small trial vectors: HF and HF + a single excitation
    hf_words, hf_occ, _ = mol.hf_reference(ham)
    d1, _ = dets.single_parity(hf_words[None], jnp.asarray([1]), jnp.asarray([3]))
    pre = str(tmp_path / "trial")
    io.save_vec_txt(pre + "0_", np.asarray(hf_words)[None], np.asarray([1.0]),
                    ham.n_bits)
    io.save_vec_txt(pre + "1_", np.asarray(d1), np.asarray([1.0]), ham.n_bits)
    rdir = str(tmp_path / "srun")
    common = [
        "subsp_mol", "--fcidump_path", fcid, "--epsilon", "0.05",
        "--vec_nonz", "60", "--mat_nonz", "200", "--max_dets", "256",
        "--max_iter", "6", "--save_interval", "3", "--trial_vecs", pre,
        "--n_trial", "2", "--result_dir", rdir, "--seed", "5",
    ]
    cli.main(common)
    with np.load(os.path.join(rdir, "checkpoint.npz")) as z:
        it1 = int(z["iterat"])
    assert it1 == 6
    cli.main(common + ["--load_dir", rdir])
    with np.load(os.path.join(rdir, "checkpoint.npz")) as z:
        assert int(z["iterat"]) == 12
    assert len(open(os.path.join(rdir, "h_mat.txt")).readlines()) == 12
