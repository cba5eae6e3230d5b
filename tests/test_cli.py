"""gmx-style CLI (surpass — the reference is a library only).

Drives `cli.main` in-process on the reference fixture corpus and pins
the outputs against the direct API / known parity anchors (rmsd.rs
doc values, the hbonds fixture counts).
"""

import os

import numpy as np
import pytest

from groan_rs_tpu import cli
from groan_rs_tpu.io.xvg import read_xvg

TF = "/root/reference/test_files"
TPR = os.path.join(TF, "example.tpr")
XTC = os.path.join(TF, "short_trajectory.xtc")
TRR = os.path.join(TF, "short_trajectory.trr")
AATPR = os.path.join(TF, "aa_membrane_peptide.tpr")
AAXTC = os.path.join(TF, "aa_membrane_peptide.xtc")


def _run(argv):
    assert cli.main(argv) == 0


def test_rms_matches_reference_anchor(tmp_path):
    out = str(tmp_path / "rms.xvg")
    _run(["rms", "-s", TPR, "-f", XTC, "--sel", "@protein", "-o", out])
    data = read_xvg(out)
    assert data.shape == (11, 2)
    # rmsd.rs doc-test series anchor
    assert data[0, 1] == pytest.approx(0.23669721, abs=1e-5)
    assert data[0, 0] == 0.0 and data[-1, 0] == 1000.0


def test_gyrate_and_principal(tmp_path):
    gy = str(tmp_path / "gy.xvg")
    _run(["gyrate", "-s", TPR, "-f", XTC, "--sel", "@protein", "-o", gy])
    d = read_xvg(gy)
    assert d.shape == (11, 2) and (d[:, 1] > 0).all()

    pr = str(tmp_path / "pr.xvg")
    _run(["principal", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "-o", pr])
    p = read_xvg(pr)
    assert p.shape == (11, 4)
    # I1 <= I2 <= I3 per frame
    assert (np.diff(p[:, 1:], axis=1) >= -1e-6).all()


def test_msd_prints_diffusion(tmp_path, capsys):
    out = str(tmp_path / "msd.xvg")
    _run(["msd", "-s", TPR, "-f", XTC, "--sel", "@protein", "-o", out])
    txt = capsys.readouterr().out
    assert "1e-5 cm^2/s" in txt
    d = read_xvg(out)
    assert d.shape == (11, 2) and d[0, 1] == 0.0

    from groan_rs_tpu import models
    from groan_rs_tpu.system import System

    s = System.from_file(TPR)
    s.group_create("P", "@protein")
    want = models.diffusion(s, XTC, "P")
    # .xvg stores 6 significant digits
    np.testing.assert_allclose(d[:, 1], want["msd"], rtol=2e-6, atol=1e-6)


def test_rdf_small_selection(tmp_path):
    out = str(tmp_path / "rdf.xvg")
    _run(["rdf", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "--rmax", "1.0", "--bins", "40", "-o", out])
    d = read_xvg(out)
    assert d.shape == (40, 2)
    assert d[0, 0] == pytest.approx(0.5 / 40)
    assert (d[:, 1] >= 0).all()


def test_window_flags(tmp_path):
    out = str(tmp_path / "gy.xvg")
    _run(["gyrate", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "-b", "200", "-e", "600", "-o", out])
    d = read_xvg(out)
    assert d[0, 0] == 400.0 or d[0, 0] == 200.0  # first kept frame time
    assert d[-1, 0] <= 600.0 and d.shape[0] < 11


def test_hbond_fixture_counts(tmp_path):
    out = str(tmp_path / "hb.xvg")
    # first 3 frames only (-e): the exact counts are all this asserts,
    # and the full fixture costs ~4.5 min of pure CPU on this host
    _run(["hbond", "-s", AATPR, "-f", AAXTC,
          "--acceptors", "resname SOL and name OW",
          "--donors", "resname SOL and name OW",
          "--hydrogens", "resname SOL and name HW1 HW2",
          "--cutoff", "0.3", "--angle", "150", "-e", "70100", "-o", out])
    d = read_xvg(out)
    assert d[:3, 1].astype(int).tolist() == [4675, 4644, 4629]


def test_velacc_trr(tmp_path):
    out = str(tmp_path / "vac.xvg")
    _run(["velacc", "-s", TPR, "-f", TRR, "--sel", "@protein", "-o", out])
    d = read_xvg(out)
    assert d.shape[1] == 2 and d[0, 1] > 0  # C(0) = <v^2> > 0


def test_covar_and_entropy(tmp_path, capsys):
    ev = str(tmp_path / "ev.xvg")
    proj = str(tmp_path / "proj.xvg")
    _run(["covar", "-s", TPR, "-f", XTC, "--sel", "@protein", "-o", ev,
          "--proj", proj, "--ncomp", "5"])
    d = read_xvg(ev)
    assert d.shape == (5, 2)
    assert (np.diff(d[:, 1]) <= 1e-6).all()  # descending
    assert read_xvg(proj).shape == (11, 3)

    ent = str(tmp_path / "ent.txt")
    _run(["entropy", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "-o", ent, "--temperature", "310"])
    txt = capsys.readouterr().out
    assert "Schlitter" in txt and os.path.exists(ent)


def test_sigeps_tool(tmp_path, capsys):
    out = str(tmp_path / "lj.xvg")
    _run(["sigeps", "--sigma", "0.3", "--eps", "0.5", "-o", out])
    txt = capsys.readouterr().out
    # round trip: c6 = 4 e s^6, c12 = 4 e s^12
    c6 = 4 * 0.5 * 0.3 ** 6
    c12 = 4 * 0.5 * 0.3 ** 12
    assert f"c6 = {c6:.6g}" in txt and f"c12 = {c12:.6g}" in txt
    d = read_xvg(out)
    assert d.shape == (300, 3)
    # V crosses zero at sigma, minimum is -eps at rmin
    vmin_idx = np.argmin(d[:, 1])
    assert d[vmin_idx, 1] == pytest.approx(-0.5, rel=1e-3)
    assert d[vmin_idx, 0] == pytest.approx(0.3 * 2 ** (1 / 6), abs=0.01)
    # inverse direction reproduces sigma/eps
    _run(["sigeps", "--c6", str(c6), "--c12", str(c12)])
    txt = capsys.readouterr().out
    assert "sigma = 0.3 nm" in txt and "epsilon = 0.5 kJ/mol" in txt
    assert cli.main(["sigeps", "--c6", "1.0"]) == 1


def test_genrestr_tool(tmp_path):
    out = str(tmp_path / "posre.itp")
    _run(["genrestr", "-s", TPR, "--sel", "@protein", "-o", out,
          "--fc", "500", "500", "500"])
    lines = open(out).read().splitlines()
    assert lines[0] == "[ position_restraints ]"
    body = [ln for ln in lines if ln and not ln.startswith((";", "["))]
    from groan_rs_tpu.system import System

    s = System.from_file(TPR)
    s.group_create("P", "@protein")
    idx = s.group_indices("P")
    assert len(body) == len(idx)
    first = body[0].split()
    assert int(first[0]) == int(idx[0]) + 1 and first[1] == "1"
    assert float(first[2]) == 500.0


def test_hbond_life_tool(tmp_path, capsys):
    out = str(tmp_path / "hb.xvg")
    acf = str(tmp_path / "acf.xvg")
    _run(["hbond", "-s", AATPR, "-f", AAXTC,
          "--acceptors", "resname SOL and name OW",
          "--donors", "resname SOL and name OW",
          "--hydrogens", "resname SOL and name HW1 HW2",
          "--cutoff", "0.3", "--angle", "150", "-e", "70150", "-o", out,
          "--life", acf])
    txt = capsys.readouterr().out
    assert "tau_continuous" in txt and "k_rapaport" in txt
    d = read_xvg(acf)
    assert d.shape[1] == 3
    assert d[0, 1] == pytest.approx(1.0) and d[0, 2] == pytest.approx(1.0)
    assert (d[:, 2] <= d[:, 1] + 1e-9).all()


def test_msd_mol_tool(tmp_path, capsys):
    out = str(tmp_path / "msd.xvg")
    dxvg = str(tmp_path / "diff.xvg")
    _run(["msd", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "-o", out, "--mol", dxvg])
    txt = capsys.readouterr().out
    assert "molecules)" in txt
    assert read_xvg(out).shape == (11, 2)
    d = read_xvg(dxvg)
    # Martini protein: one bonded molecule
    assert d.shape == (1, 2)


def test_mindist_pi_tool(tmp_path):
    out = str(tmp_path / "pi.xvg")
    _run(["mindist", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "--pi", "-o", out])
    d = read_xvg(out)
    assert d.shape == (11, 3)
    assert (d[:, 1] > 0.1).all()          # min image distance
    assert (d[:, 2] > d[:, 1] * 0).all() and (d[:, 2] > 0.5).all()
    # without --pi, --ref is required
    assert cli.main(["mindist", "-s", TPR, "-f", XTC, "--sel",
                     "@protein", "-o", out]) == 1


def test_anaeig_tool(tmp_path, capsys):
    proj = str(tmp_path / "proj.xvg")
    nm = str(tmp_path / "mode.xtc")
    _run(["anaeig", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "-o", proj, "--f2", XTC, "--nover", "3", "--cc", "2",
          "--nmtraj", nm, "--mode", "1", "--nframes", "7"])
    txt = capsys.readouterr().out
    assert read_xvg(proj).shape == (11, 3)
    # overlap of a trajectory with itself is exactly 1
    line = [ln for ln in txt.splitlines() if "subspace overlap" in ln][0]
    assert "(3 modes): 1.0000" in line and "RMSIP 1.0000" in line
    assert "covariance overlap: 1.0000" in [
        ln for ln in txt.splitlines() if "covariance" in ln][0]
    assert "cosine content PC1" in txt
    assert os.path.exists(nm)
    from groan_rs_tpu.system import System
    s = System.from_file(TPR)
    s.group_create("Prot", "@protein")
    sub = s.group_extract("Prot")
    assert sum(1 for _ in sub.xtc_iter(nm)) == 7


def test_cluster_tool(tmp_path, capsys):
    out = str(tmp_path / "cl.txt")
    _run(["cluster", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "--cutoff", "0.12", "-o", out])
    txt = open(out).read()
    assert txt.startswith("#") and "cluster 0:" in txt


def test_errors(tmp_path):
    # a bad selection exits 1 with an error message, not a traceback
    assert cli.main(["gyrate", "-s", TPR, "-f", XTC,
                     "--sel", "resname NOSUCH",
                     "-o", str(tmp_path / "x.xvg")]) == 1
    # unknown tool: argparse exits 2
    with pytest.raises(SystemExit):
        cli.main(["nosuchtool"])


def test_density_tool(tmp_path):
    out = str(tmp_path / "dens.xvg")
    _run(["density", "-s", TPR, "-f", XTC, "--sel", "@water",
          "--axis", "z", "--mode", "number", "--bins", "24", "-o", out])
    d = read_xvg(out)
    assert d.shape == (24, 2) and (d[:, 1] >= 0).all()
    assert d[0, 0] == pytest.approx(0.5 / 24)


def test_aa_tools(tmp_path, capsys):
    """rama / polystat / current / order handlers on the all-atom
    fixture (each model is deep-tested; this pins the CLI wiring)."""
    rama = str(tmp_path / "rama.xvg")
    _run(["rama", "-s", AATPR, "-f", AAXTC, "--sel", "@protein",
          "-o", rama])
    d = read_xvg(rama)
    assert d.shape[1] == 2 and (np.abs(d) <= 180.0).all()

    poly = str(tmp_path / "poly.xvg")
    _run(["polystat", "-s", AATPR, "-f", AAXTC, "--sel", "@water",
          "-o", poly])
    assert "chains" in capsys.readouterr().out
    d = read_xvg(poly)
    assert d.shape[1] == 3 and (d[:, 1] > 0).all()

    cur = str(tmp_path / "cur.xvg")
    _run(["current", "-s", AATPR, "-f", AAXTC, "--sel", "@water",
          "--temperature", "310", "-o", cur])
    assert "S/m" in capsys.readouterr().out
    assert read_xvg(cur)[0, 1] == 0.0

    order = str(tmp_path / "order.xvg")
    _run(["order", "-s", AATPR, "-f", AAXTC,
          "--sel", "resname POPC and name C32 C33 C34", "-o", order])
    d = read_xvg(order)
    assert d.shape[1] == 2 and (np.abs(d[:, 1]) <= 1.0 + 1e-6).all()


def _read_xtc_frames(structure, path, indices=None):
    """All (time, positions) of an xtc via the library reader."""
    from groan_rs_tpu.system import System

    s = System.from_file(structure)
    out = []
    for f in s.xtc_iter(path):
        p = f.positions if indices is None else f.positions[indices]
        out.append((f.get_time(), p.copy()))
    return out


def test_trjconv_subset_roundtrip(tmp_path):
    """trjconv with a selection writes exactly the group's coordinates."""
    from groan_rs_tpu.system import System

    out = str(tmp_path / "prot.xtc")
    _run(["trjconv", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "-o", out])
    s = System.from_file(TPR)
    s.group_create("P", "@protein")
    idx = s.group_indices("P")
    want = _read_xtc_frames(TPR, XTC, idx)

    sub = System.from_file(TPR)
    sub.group_create("P", "@protein")
    sub = sub.group_extract("P")
    got = [(f.get_time(), f.positions.copy()) for f in sub.xtc_iter(out)]
    assert len(got) == len(want) == 11
    for (tg, pg), (tw, pw) in zip(got, want):
        assert tg == tw
        # re-quantization at the same 1000/nm precision: one grid cell
        np.testing.assert_allclose(pg, pw, atol=1.5e-3)


def test_trjconv_dump_split_sep(tmp_path, capsys):
    from groan_rs_tpu.system import System

    # --dump: the single frame nearest the requested time.  The fixture
    # has 11 frames at 0,100,...,1000 ps: t=540 picks the 500 ps frame
    out = str(tmp_path / "dump.gro")
    _run(["trjconv", "-s", TPR, "-f", XTC, "-o", out, "--dump", "540"])
    assert "t=500" in capsys.readouterr().out
    s = System.from_file(TPR)
    frames = [(f.get_time(), f.positions.copy()) for f in s.xtc_iter(XTC)]
    want = [p for (t, p) in frames if t == 500.0][0]
    got = System.from_file(out)
    assert got.get_n_atoms() == s.get_n_atoms()
    np.testing.assert_allclose(got.positions, want, atol=1.5e-3)

    # --sep: one numbered file per frame
    outs = str(tmp_path / "sep.xtc")
    _run(["trjconv", "-s", TPR, "-f", XTC, "-o", outs, "--sep",
          "-e", "400"])
    import glob

    parts = sorted(glob.glob(str(tmp_path / "sep.part*.xtc")))
    assert len(parts) == 5                      # 0, 100, ..., 400 ps
    s2 = System.from_file(TPR)
    assert sum(1 for _ in s2.xtc_iter(parts[0])) == 1

    # --split 300: segments [200..400], [500..700], ...
    outp = str(tmp_path / "spl.xtc")
    _run(["trjconv", "-s", TPR, "-f", XTC, "-o", outp, "--split", "300"])
    parts = sorted(glob.glob(str(tmp_path / "spl.part*.xtc")))
    assert len(parts) == 4                      # [0,300) [300,600) ...
    counts = [sum(1 for _ in System.from_file(TPR).xtc_iter(p))
              for p in parts]
    assert counts == [3, 3, 3, 2]


def test_dump_tool(capsys):
    _run(["dump", "-s", TPR, "-f", XTC, "--max-atoms", "3",
          "--max-frames", "2"])
    txt = capsys.readouterr().out
    assert "natoms = 16844" in txt
    assert "atom 0:" in txt and "atom 2:" in txt
    assert "frame 0: t=0" in txt and "frame 1: t=100" in txt
    assert "x[2] =" in txt
    assert cli.main(["dump"]) == 1              # needs -s


def test_trjconv_pbc_whole_and_windows(tmp_path):
    from groan_rs_tpu.models.convert import MakeWholeConverter, convert_iter
    from groan_rs_tpu.system import System

    out = str(tmp_path / "whole.xtc")
    _run(["trjconv", "-s", TPR, "-f", XTC, "--pbc", "whole",
          "-b", "200", "-e", "600", "-o", out])
    s = System.from_file(TPR)
    want = [(f.get_time(), f.positions.copy())
            for f in convert_iter(
                s.xtc_iter(XTC, start_time=200, end_time=600),
                [MakeWholeConverter()])]
    got = _read_xtc_frames(TPR, out)
    assert len(got) == len(want) > 0
    for (tg, pg), (tw, pw) in zip(got, want):
        assert tg == tw
        # the fixture's xtc precision is 100/nm: whole-box shifts land
        # off-grid, so re-quantization costs up to half a 0.01 nm cell
        np.testing.assert_allclose(pg, pw, atol=5.1e-3)


def test_trjconv_fit(tmp_path):
    """--fit RMSD-fits every frame onto the structure: read-back frames
    carry the reference COM and the fit-invariant RMSD anchor."""
    from groan_rs_tpu.system import System

    out = str(tmp_path / "fit.xtc")
    _run(["trjconv", "-s", TPR, "-f", XTC, "--fit", "@protein",
          "-o", out])
    ref = System.from_file(TPR)
    ref.group_create("P", "@protein")
    ref_com = np.asarray(ref.group_get_com("P"))

    check = System.from_file(TPR)
    check.group_create("P", "@protein")
    n = 0
    for f in check.xtc_iter(out):
        com = np.asarray(f.group_get_com("P"))
        np.testing.assert_allclose(com, ref_com, atol=0.01)
        if n == 0:
            # optimal-rotation RMSD is invariant under the applied fit;
            # re-quantization at the fixture's 100/nm grid adds ~2e-3
            assert f.calc_rmsd(ref, "P") == pytest.approx(0.23669721,
                                                          abs=2e-3)
        n += 1
    assert n == 11


def test_trjcat_matches_unsplit(tmp_path):
    """trjcat over the reference split fixtures reproduces the unsplit
    trajectory (boundary time dedup, traj_cat.rs semantics)."""
    split = os.path.join(TF, "split")
    files = [os.path.join(split, f"traj{i}.xtc") for i in (1, 2, 3, 4, 5, 6)]
    out = str(tmp_path / "cat.xtc")
    _run(["trjcat", "-s", TPR, "-f", *files, "-o", out])
    got = _read_xtc_frames(TPR, out)
    want = _read_xtc_frames(TPR, XTC)
    assert [t for t, _ in got] == [t for t, _ in want]
    for (_, pg), (_, pw) in zip(got, want):
        np.testing.assert_allclose(pg, pw, atol=1.5e-3)


def test_make_ndx(tmp_path):
    out = str(tmp_path / "index.ndx")
    _run(["make_ndx", "-s", TPR,
          "--group", "Prot=@protein", "--group", "Wat=@water",
          "-o", out])
    from groan_rs_tpu.system import System

    s = System.from_file(TPR)
    s.read_ndx(out)
    s2 = System.from_file(TPR)
    s2.group_create("P", "@protein")
    assert (s.group_indices("Prot") == s2.group_indices("P")).all()
    assert s.group_exists("Wat")
    # malformed spec is a clean error
    assert cli.main(["make_ndx", "-s", TPR, "--group", "noequals",
                     "-o", out]) == 1


def test_editconf_subset_gro_pdb(tmp_path):
    from groan_rs_tpu.system import System

    gro = str(tmp_path / "prot.gro")
    _run(["editconf", "-s", TPR, "--sel", "@protein", "-o", gro])
    pdb = str(tmp_path / "prot.pdb")
    _run(["editconf", "-s", TPR, "--sel", "@protein", "-o", pdb])

    s = System.from_file(TPR)
    s.group_create("P", "@protein")
    n = len(s.group_indices("P"))
    g = System.from_file(gro)
    assert g.get_n_atoms() == n
    p = System.from_file(pdb)
    assert p.get_n_atoms() == n
    np.testing.assert_allclose(g.positions, p.positions, atol=1.5e-3)

    bad = cli.main(["editconf", "-s", TPR, "-o", str(tmp_path / "x.xtc")])
    assert bad == 1


def test_check_tool(capsys):
    _run(["check", "-s", TPR, "-f", XTC])
    out = capsys.readouterr().out
    assert "atoms:    16844" in out
    assert "frames: 11" in out
    assert "0 .. 1000 ps" in out
    assert "dt:     100 ps" in out


def test_distance_and_traj_tools(tmp_path):
    from groan_rs_tpu import models
    from groan_rs_tpu.system import System

    out = str(tmp_path / "d.xvg")
    _run(["distance", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "--ref", "@water", "-o", out])
    d = read_xvg(out)
    s = System.from_file(TPR)
    s.group_create("P", "@protein")
    s.group_create("W", "@water")
    pipe = models.TrajectoryAnalysis(s)
    pipe.add_distance("P", "W", name="d")
    want = pipe.run(XTC)
    np.testing.assert_allclose(d[:, 1], want["d"], rtol=1e-6, atol=1e-6)

    com = str(tmp_path / "com.xvg")
    _run(["traj", "-s", TPR, "-f", XTC, "--sel", "@protein", "-o", com])
    c = read_xvg(com)
    assert c.shape == (11, 4)
    pipe2 = models.TrajectoryAnalysis(System.from_file(TPR))
    pipe2.system.group_create("P", "@protein")
    pipe2.add_com("P", name="c")
    want2 = np.asarray(pipe2.run(XTC)["c"], np.float64)
    np.testing.assert_allclose(c[:, 1:], want2, rtol=1e-6, atol=1e-6)


def test_angle_tool(tmp_path):
    out = str(tmp_path / "ang.xvg")
    # three consecutive water atoms per molecule: OW HW1 HW2 -> HOH-ish
    # site triples in index order; just pin wiring + ranges here (the
    # geometry op itself is oracle-tested in test_geometry)
    _run(["angle", "-s", AATPR, "-f", AAXTC,
          "--sel", "resname SOL and name OW HW1 HW2", "-o", out])
    d = read_xvg(out)
    assert d.shape[1] == 2 and (d[:, 1] > 0).all() and (d[:, 1] < 180).all()
    # non-multiple-of-3 selection is a clean error
    assert cli.main(["angle", "-s", TPR, "-f", XTC, "--sel", "serial 1 2",
                     "-o", out]) == 1


def test_analyze_tool(tmp_path, capsys):
    from groan_rs_tpu.io.xvg import write_xvg

    # AR(0) white noise + a constant column
    rng = np.random.default_rng(7)
    t = np.arange(400, dtype=np.float64)
    y = rng.normal(3.0, 0.5, 400)
    path = str(tmp_path / "in.xvg")
    write_xvg(path, [t, y, np.full(400, 2.5)])
    ac = str(tmp_path / "ac.xvg")
    _run(["analyze", "-f", path, "--ac", ac])
    out = capsys.readouterr().out
    assert "400 points, 2 data set(s)" in out
    # mean/std close to the generating distribution
    line = [ln for ln in out.splitlines() if ln.startswith("set 0")][0]
    mean = float(line.split("mean")[1].split()[0])
    assert mean == pytest.approx(3.0, abs=0.1)
    const = [ln for ln in out.splitlines() if ln.startswith("set 1")][0]
    assert "std 0 " in const

    d = read_xvg(ac)
    assert d.shape == (200, 3)
    assert d[0, 1] == pytest.approx(1.0)      # C(0) = 1
    assert d[0, 2] == pytest.approx(1.0)      # constant column: defined as 1
    # white noise decorrelates immediately
    assert abs(d[1:, 1]).max() < 0.25


def test_dos_refuses_nonuniform_grid(tmp_path):
    # every reference TRR is irregularly subsampled: the dos tool must
    # surface the typed error as exit 1, not a traceback
    assert cli.main(["dos", "-s", TPR, "-f", TRR, "--sel", "@protein",
                     "-o", str(tmp_path / "dos.xvg")]) == 1


def test_rotmat_and_dccm_tools(tmp_path, capsys):
    rm = str(tmp_path / "rotmat.xvg")
    _run(["rotmat", "-s", TPR, "-f", XTC, "--sel", "@protein", "-o", rm])
    d = read_xvg(rm)
    assert d.shape == (11, 10)
    # each row is a proper rotation: orthonormal columns, det +1
    for f in range(d.shape[0]):
        r = d[f, 1:].reshape(3, 3)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-4)

    dc = str(tmp_path / "dccm.dat")
    _run(["dccm", "-s", TPR, "-f", XTC, "--sel", "@protein", "-o", dc])
    assert "61x61" in capsys.readouterr().out
    m = np.loadtxt(dc)
    assert m.shape == (61, 61)
    np.testing.assert_allclose(np.diag(m), 1.0, atol=0)
    np.testing.assert_allclose(m, m.T, atol=1e-5)


def test_clustsize_tool(tmp_path, capsys):
    out = str(tmp_path / "cs.xvg")
    hist = str(tmp_path / "hist.xvg")
    _run(["clustsize", "-s", AATPR, "-f", AAXTC, "--sel", "@protein",
          "--mode", "atom", "--hist", hist, "-o", out])
    txt = capsys.readouterr().out
    assert "entities" in txt
    d = read_xvg(out)
    assert d.shape[1] == 5
    # a bonded peptide is one contact cluster per frame
    assert (d[:, 1] == 1).all()
    assert (d[:, 2] == d[0, 2]).all() and d[0, 2] > 100
    h = read_xvg(hist)
    assert h[:, 1].sum() == d.shape[0]


def test_freevolume_tool(tmp_path, capsys):
    out = str(tmp_path / "fv.xvg")
    _run(["freevolume", "-s", AATPR, "-f", AAXTC,
          "--sel", "not resname NA CL", "--samples", "512", "-o", out])
    txt = capsys.readouterr().out
    assert "mean free-volume fraction" in txt
    d = read_xvg(out)
    assert d.shape == (21, 3)
    assert ((d[:, 1] > 0.05) & (d[:, 1] < 0.9)).all()


def test_densmap_tool(tmp_path, capsys):
    out = str(tmp_path / "dm.dat")
    _run(["densmap", "-s", AATPR, "-f", AAXTC, "--sel", "name P",
          "--axes", "xz", "--bins", "8", "16", "-o", out])
    assert "8x16 xz map" in capsys.readouterr().out
    from groan_rs_tpu.core.gridmap import GridMap
    gm = GridMap.from_file(out)
    assert gm.n_tiles_x() == 8 and gm.n_tiles_y() == 16
    assert gm.values.sum() > 0


def test_vanhove_tool(tmp_path, capsys):
    out = str(tmp_path / "vh.xvg")
    _run(["vanhove", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "--lags", "1", "5", "--bins", "25", "--rmax", "3.0",
          "-o", out])
    assert "2 lags" in capsys.readouterr().out
    d = read_xvg(out)
    assert d.shape == (25, 3)
    # each lag's Gs integrates to <= 1 (== 1 minus overflow)
    dr = 3.0 / 25
    assert d[:, 1].sum() * dr <= 1.0 + 1e-6
    assert d[:, 1].sum() * dr > 0.5


def test_rmsdist_tool(tmp_path, capsys):
    out = str(tmp_path / "rd.xvg")
    mm = str(tmp_path / "mean.dat")
    _run(["rmsdist", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "-o", out, "--mean-matrix", mm])
    txt = capsys.readouterr().out
    assert "mean RMSdist" in txt
    d = read_xvg(out)
    assert d.shape == (11, 2) and (d[1:, 1] > 0).all()
    m = np.loadtxt(mm)
    k = m.shape[0]
    assert m.shape == (k, k) and (np.diag(m) == 0).all()


def test_saxs_tool(tmp_path, capsys):
    out = str(tmp_path / "sx.xvg")
    _run(["saxs", "-s", AATPR, "-f", AAXTC, "--sel", "@protein",
          "--qmin", "0.5", "--qmax", "8", "--nq", "10", "-o", out])
    assert "I(0) bound" in capsys.readouterr().out
    d = read_xvg(out)
    assert d.shape == (10, 2) and (d[:, 1] > 0).all()


def test_sans_tool(tmp_path, capsys):
    out = str(tmp_path / "sn.xvg")
    _run(["sans", "-s", AATPR, "-f", AAXTC, "--sel", "@protein",
          "--qmin", "0.5", "--qmax", "8", "--nq", "6", "-o", out])
    assert "fm^2" in capsys.readouterr().out
    d = read_xvg(out)
    assert d.shape == (6, 2)
    dd = str(tmp_path / "snd.xvg")
    _run(["sans", "-s", AATPR, "-f", AAXTC, "--sel", "@protein",
          "--qmin", "0.5", "--qmax", "8", "--nq", "6", "--deuterate",
          "-o", dd])
    # deuteration raises the protein contrast (b_H < 0 -> b_D > 0)
    assert read_xvg(dd)[0, 1] > d[0, 1]


def test_wham_tool(tmp_path, capsys):
    from groan_rs_tpu.io.xvg import write_xvg

    rng = np.random.default_rng(53)
    kt = 0.00831446261815324 * 300.0
    files, centers = [], np.linspace(-0.5, 0.5, 7)
    for i, x0 in enumerate(centers):
        t = np.arange(20000, dtype=np.float64)
        xs = rng.normal(x0, np.sqrt(kt / 700.0), 20000)
        p = str(tmp_path / f"w{i}.xvg")
        write_xvg(p, [t, xs])
        files.append(p)
    out = str(tmp_path / "pmf.xvg")
    _run(["wham", "-f", *files,
          "--centers", *[f"{c:.6f}" for c in centers],
          "--k", "700", "--bins", "40", "-o", out])
    assert "converged" in capsys.readouterr().out
    d = read_xvg(out)
    # flat PMF recovered within noise over the well-sampled middle
    mid = np.abs(d[:, 0]) < 0.4
    assert d[mid, 1].max() < 0.4 * kt


def test_sorient_and_h2order_tools(tmp_path, capsys):
    so = str(tmp_path / "so.xvg")
    _run(["sorient", "-s", AATPR, "-f", AAXTC, "--sel", "@protein",
          "--oxygen", "resname SOL and name OW",
          "--hydrogens", "resname SOL and name HW1 HW2",
          "--rmax", "0.6", "--bins", "20", "-o", so])
    assert "water-frames" in capsys.readouterr().out
    d = read_xvg(so)
    assert d.shape == (20, 3)
    # both histograms are probability densities over cos in [-1, 1]
    dc = 2.0 / 20
    assert d[:, 1].sum() * dc == pytest.approx(1.0, rel=1e-4)
    assert d[:, 2].sum() * dc == pytest.approx(1.0, rel=1e-4)

    h2 = str(tmp_path / "h2.xvg")
    _run(["h2order", "-s", AATPR, "-f", AAXTC,
          "--oxygen", "resname SOL and name OW",
          "--hydrogens", "resname SOL and name HW1 HW2",
          "--bins", "16", "-o", h2])
    assert "slabs occupied" in capsys.readouterr().out
    d = read_xvg(h2)
    assert (np.abs(d[:, 1]) <= 1.0 + 1e-6).all()


def test_hbond_distributions(tmp_path):
    out = str(tmp_path / "hb.xvg")
    dist = str(tmp_path / "dist.xvg")
    ang = str(tmp_path / "ang.xvg")
    _run(["hbond", "-s", AATPR, "-f", AAXTC,
          "--acceptors", "resname SOL and name OW",
          "--donors", "resname SOL and name OW",
          "--hydrogens", "resname SOL and name HW1 HW2",
          "--cutoff", "0.3", "--angle", "150",
          "--step", "10",
          "--dist", dist, "--ang", ang, "-o", out])
    d = read_xvg(dist)
    a = read_xvg(ang)
    assert d.shape == (50, 2) and a.shape == (50, 2)
    # densities integrate to 1 over their ranges
    assert d[:, 1].sum() * (0.3 / 50) == pytest.approx(1.0, rel=1e-4)
    assert a[:, 1].sum() * (30.0 / 50) == pytest.approx(1.0, rel=1e-4)
    # water O-O hbonds peak near 0.28 nm, well inside the range
    assert d[np.argmax(d[:, 1]), 0] == pytest.approx(0.28, abs=0.02)
    # all angles within the criterion
    assert (a[:, 0] >= 150.0).all() and (a[:, 0] <= 180.0).all()


def test_spatial_tool(tmp_path, capsys):
    out = str(tmp_path / "sdf.cube")
    _run(["spatial", "-s", AATPR, "-f", AAXTC,
          "--sel", "resname SOL and name OW", "--ref", "@protein",
          "--side", "3.0", "--bins", "12", "-o", out])
    assert "occupancy" in capsys.readouterr().out
    lines = open(out).read().splitlines()
    assert int(lines[3].split()[0]) == 12
    vals = [float(x) for ln in lines[7:] for x in ln.split()]
    assert len(vals) == 12 ** 3 and max(vals) > 0


def test_confrms_tool(tmp_path, capsys):
    from groan_rs_tpu.system import System

    # translate+perturb a copy of the fixture, fit it back
    src = System.from_file(os.path.join(TF, "example.gro"))
    moved = System.from_file(os.path.join(TF, "example.gro"))
    moved.group_create("P", "@protein")
    moved.atoms_translate(np.array([1.0, -0.5, 0.7], np.float32))
    f2 = str(tmp_path / "moved.gro")
    moved.write_gro(f2)

    out = str(tmp_path / "fit.gro")
    _run(["confrms", "-f1", os.path.join(TF, "example.gro"), "-f2", f2,
          "--sel", "@protein", "-o", out])
    txt = capsys.readouterr().out
    assert "RMSD after fit:" in txt
    rmsd = float(txt.split("RMSD after fit:")[1].split()[0])
    # a rigid translation fits back to ~write-precision zero
    assert rmsd < 2e-3
    fit = System.from_file(out)
    src.group_create("P", "@protein")
    fit.group_create("P", "@protein")
    a = np.asarray(src.positions)[src.group_indices("P")]
    b = np.asarray(fit.positions)[fit.group_indices("P")]
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_prep_tools(tmp_path, capsys):
    from groan_rs_tpu.core.simbox import SimBox
    from groan_rs_tpu.core.topology import StrColumn, Topology
    from groan_rs_tpu.system import System

    # a tiny host box + a 2-atom molecule + a water tile, via gro files
    def mono(name, pos, box, resname=None):
        pos = np.asarray(pos, np.float32).reshape(-1, 3)
        n = pos.shape[0]
        topo = Topology(n)
        topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
        topo.resnum = np.ones(n, np.int64)
        topo.atomname = StrColumn(values=np.asarray([name] * n))
        topo.resname = StrColumn(values=np.asarray([resname or name] * n))
        return System(name, topo,
                      simbox=SimBox.from_lengths(*map(float, box)),
                      positions=pos)

    host = str(tmp_path / "host.gro")
    mono("BIG", [[2.0, 2.0, 2.0]], (4, 4, 4)).write_gro(host)
    ci = str(tmp_path / "mol.gro")
    mono("INS", [[0, 0, 0], [0.15, 0, 0]], (1, 1, 1)).write_gro(ci)

    ins = str(tmp_path / "ins.gro")
    _run(["insert-molecules", "-f", host, "--ci", ci, "--nmol", "4",
          "--radius", "0.3", "-o", ins])
    assert "inserted 4 molecules" in capsys.readouterr().out
    assert System.from_file(ins).get_n_atoms() == 9

    # water tile: 8 waters on a grid
    coords, resnums, names = [], [], []
    for i in range(2):
        for j in range(2):
            for k in range(2):
                o = np.array([i, j, k], np.float64) + 0.3
                coords.extend([o, o + [0.1, 0, 0], o + [0, 0.1, 0]])
                resnums.extend([i * 4 + j * 2 + k + 1] * 3)
                names.extend(["OW", "HW1", "HW2"])
    n = len(coords)
    topo = Topology(n)
    topo.atomnum = np.arange(1, n + 1, dtype=np.int64)
    topo.resnum = np.asarray(resnums, np.int64)
    topo.atomname = StrColumn(values=np.asarray(names))
    topo.resname = StrColumn(values=np.asarray(["SOL"] * n))
    tile = System("w", topo, simbox=SimBox.from_lengths(2, 2, 2),
                  positions=np.asarray(coords, np.float32))
    cs = str(tmp_path / "tile.gro")
    tile.write_gro(cs)

    solv = str(tmp_path / "solv.gro")
    _run(["solvate", "-f", host, "--cs", cs, "--radius", "0.35",
          "-o", solv])
    out = capsys.readouterr().out
    assert "solvent molecules" in out

    ionized = str(tmp_path / "ions.gro")
    _run(["genion", "-f", solv, "--np", "2", "--nn", "2", "-o", ionized])
    assert "replaced 4 solvent molecules" in capsys.readouterr().out
    back = System.from_file(ionized)
    back.group_create("I", "resname NA CL")
    assert len(back.group_indices("I")) == 4


def test_gyrate_components_and_rdf_cn(tmp_path):
    gy = str(tmp_path / "gyc.xvg")
    _run(["gyrate", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "--components", "-o", gy])
    d = read_xvg(gy)
    assert d.shape == (11, 5)
    # Rg^2 = (RgX^2 + RgY^2 + RgZ^2) / 2 identity
    np.testing.assert_allclose(
        (d[:, 2] ** 2 + d[:, 3] ** 2 + d[:, 4] ** 2) / 2.0,
        d[:, 1] ** 2, rtol=1e-4)

    rdf = str(tmp_path / "cn.xvg")
    _run(["rdf", "-s", AATPR, "-f", AAXTC,
          "--sel", "resname SOL and name OW",
          "--rmax", "1.0", "--bins", "50", "--cn", "-o", rdf])
    d = read_xvg(rdf)
    assert d.shape == (50, 3)
    # cn is nonnegative and monotone; first water shell coordination
    # reaches a few molecules by r = 0.35 nm
    assert (np.diff(d[:, 2]) >= -1e-9).all()
    i35 = int(0.35 / (1.0 / 50))
    assert 2.0 < d[i35, 2] < 8.0


def test_filter_and_covar_extr(tmp_path, capsys):
    from groan_rs_tpu.system import System

    out = str(tmp_path / "filt.xtc")
    _run(["filter", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "--window", "3", "-o", out])
    assert "wrote 11 filtered frames" in capsys.readouterr().out
    s = System.from_file(TPR)
    s.group_create("P", "@protein")
    sub = s.group_extract("P")
    frames = [f.positions.copy() for f in sub.xtc_iter(out)]
    assert len(frames) == 11

    ev = str(tmp_path / "ev.xvg")
    extr = str(tmp_path / "extr.gro")
    _run(["covar", "-s", TPR, "-f", XTC, "--sel", "@protein", "-o", ev,
          "--extr", extr, "--extr-pc", "1", "--ncomp", "3"])
    assert "extremes along PC1" in capsys.readouterr().out
    es = System.from_file(TPR)
    es.group_create("P", "@protein")
    esub = es.group_extract("P")
    ext_frames = [f.positions.copy() for f in esub.gro_iter(extr)]
    assert len(ext_frames) == 2
    # the two extremes differ along PC1 but have the same atom count
    d = np.linalg.norm(ext_frames[0] - ext_frames[1], axis=-1)
    assert d.max() > 0.01


def test_dssp_8state_tool(tmp_path, capsys):
    out = str(tmp_path / "ss8.xvg")
    _run(["dssp", "-s", AATPR, "-f", AAXTC, "--sel", "@protein",
          "--states", "8", "-o", out])
    txt = capsys.readouterr().out
    assert "'G'" in txt and "'T'" in txt
    d = read_xvg(out)
    assert d.shape[1] == 9
    # per-frame counts over all 8 codes sum to the residue count
    totals = d[:, 1:].sum(axis=1)
    assert (totals == totals[0]).all()


def test_genconf_tool(tmp_path, capsys):
    from groan_rs_tpu.system import System

    out = str(tmp_path / "rep.gro")
    _run(["genconf", "-f", os.path.join(TF, "example.gro"),
          "--nbox", "1", "2", "1", "-o", out])
    assert "2 copies" in capsys.readouterr().out
    src = System.from_file(os.path.join(TF, "example.gro"))
    rep = System.from_file(out)
    assert rep.get_n_atoms() == 2 * src.get_n_atoms()
    assert rep.simbox.y == pytest.approx(2 * src.simbox.y, rel=1e-5)


def test_tcaf_tool(tmp_path, capsys):
    from groan_rs_tpu.io import native

    rng = np.random.default_rng(89)
    f, k_atoms = 8, 20
    pos = rng.uniform(0, 2, size=(f, k_atoms, 3)).astype(np.float32)
    vel = rng.normal(size=(f, k_atoms, 3)).astype(np.float32)
    b9 = np.diag([2.0, 2.0, 2.0]).astype(np.float32).reshape(9)
    trr = str(tmp_path / "v.trr")
    for i in range(f):
        native.trr_write_frame(trr, k_atoms, i, float(i), 0.0, b9,
                               x=pos[i], v=vel[i])
    # a matching structure file
    from groan_rs_tpu.core.simbox import SimBox
    from groan_rs_tpu.core.topology import Topology
    from groan_rs_tpu.system import System

    from groan_rs_tpu.core.topology import StrColumn

    topo = Topology(k_atoms)
    topo.atomnum = np.arange(1, k_atoms + 1, dtype=np.int64)
    topo.resnum = np.arange(k_atoms, dtype=np.int64) + 1
    topo.resname = StrColumn(values=np.asarray(["ALA"] * k_atoms))
    topo.atomname = StrColumn(values=np.asarray(["C"] * k_atoms))
    s = System("t", topo, simbox=SimBox.from_lengths(2, 2, 2),
               positions=pos[0])
    gro = str(tmp_path / "t.gro")
    s.write_gro(gro)

    out = str(tmp_path / "tc.xvg")
    _run(["tcaf", "-s", gro, "-f", trr, "--nk", "2", "-o", out])
    assert "eta0" in capsys.readouterr().out
    d = read_xvg(out)
    assert d.shape == (f, 3)
    np.testing.assert_allclose(d[0, 1:], 1.0)


def test_cluster_methods_and_sham(tmp_path, capsys):
    out = str(tmp_path / "cl.txt")
    _run(["cluster", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "--cutoff", "0.15", "--method", "linkage", "-o", out])
    assert "method linkage" in open(out).read()
    _run(["cluster", "-s", TPR, "-f", XTC, "--sel", "@protein",
          "--method", "jarvis-patrick", "--jp-m", "4", "--jp-p", "2",
          "-o", out])
    assert "jarvis-patrick" in open(out).read()

    # sham on a known two-well sample: G difference = kT ln(n1/n2)
    from groan_rs_tpu.io.xvg import write_xvg
    from groan_rs_tpu.core.gridmap import GridMap

    xy = np.concatenate([
        np.tile([[0.25, 0.25]], (400, 1)),
        np.tile([[0.75, 0.75]], (100, 1)),
    ])
    t = np.arange(xy.shape[0], dtype=np.float64)
    proj = str(tmp_path / "proj.xvg")
    write_xvg(proj, [t, xy[:, 0], xy[:, 1]])
    gdat = str(tmp_path / "g.dat")
    _run(["sham", "-f", proj, "--bins", "2", "2", "--temp", "300",
          "-o", gdat])
    assert "2/4 bins sampled" in capsys.readouterr().out
    gm = GridMap.from_file(gdat)
    kt = 0.00831446261815324 * 300.0
    vals = np.sort(gm.values.reshape(-1))
    assert vals[0] == pytest.approx(0.0)
    assert vals[1] == pytest.approx(kt * np.log(4.0), rel=1e-6)


def test_helixorient_tool(tmp_path, capsys):
    out = str(tmp_path / "hx.xvg")
    _run(["helixorient", "-s", AATPR, "-f", AAXTC, "--sel", "@protein",
          "-o", out])
    txt = capsys.readouterr().out
    assert "mean tilt" in txt
    d = read_xvg(out)
    assert d.shape[1] == 5
    # a WALP-like TM helix: alpha rise ~0.15 nm, twist ~100 deg
    assert 0.10 < d[:, 2].mean() < 0.20
    assert 85.0 < d[:, 3].mean() < 115.0


def _bundle_gro(tmp_path):
    import numpy as np

    from groan_rs_tpu.core.simbox import SimBox
    from groan_rs_tpu.core.topology import StrColumn, Topology
    from groan_rs_tpu.io import native
    from groan_rs_tpu.system import System

    pos = []
    for k in range(4):
        ang = np.pi / 2 * k
        base = np.array([5.0 + np.cos(ang), 5.0 + np.sin(ang), 0.0])
        pos.extend([base + [0, 0, 2.0], base + [0, 0, 5.0]])
    pos = np.asarray(pos, np.float32)
    topo = Topology(8)
    topo.atomnum = np.arange(1, 9, dtype=np.int64)
    topo.resnum = np.arange(1, 9, dtype=np.int64)
    topo.atomname = StrColumn(values=np.asarray(["B", "T"] * 4))
    topo.resname = StrColumn(values=np.asarray(["HLX"] * 8))
    s = System("bundle", topo, simbox=SimBox.from_lengths(10, 10, 10),
               positions=pos)
    gro = str(tmp_path / "bundle.gro")
    s.write_gro(gro)
    xtc = str(tmp_path / "bundle.xtc")
    b9 = np.diag([10.0, 10.0, 10.0]).astype(np.float32).reshape(9)
    for i in range(3):
        native.xtc_write_frame(xtc, 8, i, float(i), b9, pos, 100000.0)
    return gro, xtc


def test_bundle_tool(tmp_path, capsys):
    gro, xtc = _bundle_gro(tmp_path)
    out = str(tmp_path / "bundle.xvg")
    _run(["bundle", "-s", gro, "-f", xtc, "--tops", "name T",
          "--bottoms", "name B", "--na", "4", "--cog", "-o", out])
    txt = capsys.readouterr().out
    assert "mean length 3.0000 nm" in txt
    d = read_xvg(out)
    assert d.shape == (3, 25)            # frame + 6 quantities x 4 axes
    assert np.allclose(d[:, 1:5], 3.0, atol=1e-4)     # lengths
    assert np.allclose(d[:, 5:9], 1.0, atol=1e-4)     # distances


def test_dyecoupl_tool(tmp_path, capsys):
    gro, xtc = _bundle_gro(tmp_path)
    out = str(tmp_path / "dye.xvg")
    _run(["dyecoupl", "-s", gro, "-f", xtc, "--donor", "serial 1 2",
          "--acceptor", "serial 3 4", "--r0", "1.5", "-o", out])
    txt = capsys.readouterr().out
    assert "<kappa^2>" in txt and "<E>" in txt
    d = read_xvg(out)
    assert d.shape == (3, 4)             # frame, R, kappa2, E
    assert np.all((d[:, 3] > 0) & (d[:, 3] < 1))


def test_chi_tool(tmp_path, capsys):
    out = str(tmp_path / "chi.xvg")
    _run(["chi", "-s", AATPR, "-f", AAXTC, "--sel", "@protein",
          "--max-chi", "2", "-o", out])
    txt = capsys.readouterr().out
    assert "g+" in txt and "t " in txt
    d = read_xvg(out)
    assert d.shape[0] == 21 and d.shape[1] > 10   # 21-frame fixture
    assert np.nanmax(np.abs(d[:, 1:])) <= 180.0


def test_bar_tool(tmp_path, capsys):
    import numpy as np

    from groan_rs_tpu.io.xvg import write_xvg

    kt = 0.00831446261815324 * 300.0
    rng = np.random.default_rng(23)
    df, sigma = 2.5, 1.0
    wf = rng.normal(df + sigma**2 / (2 * kt), sigma, 20000)
    wr = rng.normal(-df + sigma**2 / (2 * kt), sigma, 20000)
    f1 = str(tmp_path / "fwd.xvg")
    r1 = str(tmp_path / "rev.xvg")
    t = np.arange(wf.size, dtype=np.float64)
    write_xvg(f1, [t, wf], title="w", xlabel="t", ylabel="W")
    write_xvg(r1, [t, wr], title="w", xlabel="t", ylabel="W")
    out = str(tmp_path / "bar.xvg")
    _run(["bar", "-F", f1, "-R", r1, "-o", out])
    txt = capsys.readouterr().out
    assert "total:" in txt
    d = read_xvg(out)
    assert d.shape == (1, 3)
    assert abs(d[0, 1] - df) < 0.1


def test_gangle_and_pairdist_tools(tmp_path, capsys):
    gro, xtc = _bundle_gro(tmp_path)       # 4 vertical 2-atom "axes"
    out = str(tmp_path / "ga.xvg")
    _run(["gangle", "-s", gro, "-f", xtc, "--sel", "name B T",
          "--g1", "vector", "--g2", "z", "--all", "-o", out])
    d = read_xvg(out)
    assert d.shape == (3, 5)
    assert np.allclose(d[:, 1:], 0.0, atol=1e-3)   # all along +z

    out2 = str(tmp_path / "pd.xvg")
    _run(["pairdist", "-s", gro, "-f", xtc, "--sel", "resid 1 2",
          "--ref", "resid 3 4", "--split", "group", "--mode", "min",
          "-o", out2])
    txt = capsys.readouterr().out
    assert "1x1 unit pairs" in txt
    d2 = read_xvg(out2)
    assert d2.shape == (3, 2) and (d2[:, 1] > 0).all()


def test_select_tool(tmp_path):
    out = str(tmp_path / "size.xvg")
    occ = str(tmp_path / "occ.xvg")
    ndx = str(tmp_path / "sel.ndx")
    _run(["select", "-s", TPR, "-f", XTC, "--sel", "name W",
          "--within", "0.7", "--of", "@protein", "-o", out,
          "--oc", occ, "--on", ndx])
    d = read_xvg(out)
    assert d.shape[0] == 11 and (d[:, 1] > 0).all()
    o = read_xvg(occ)
    assert 0.0 <= o[:, 1].min() and o[:, 1].max() <= 1.0
    # per-frame ndx groups parse back and sizes agree
    txt = open(ndx).read()
    assert txt.count("[ sel_f") == 11
    first = txt.split("[ sel_f1 ]")[0].split("]", 1)[1].split()
    assert len(first) == int(d[0, 1])

    sph = str(tmp_path / "sph.xvg")
    _run(["select", "-s", TPR, "-f", XTC, "--sel", "name W",
          "--sphere", "5,5,5,2.0", "-o", sph])
    ds = read_xvg(sph)
    assert ds.shape[0] == 11


def test_saltbr_tool(tmp_path):
    out = str(tmp_path / "sb.xvg")
    _run(["saltbr", "-s", TPR, "-f", XTC,
          "--sel", "resname ION or resname LYS ARG GLU ASP", "-o", out])
    d = read_xvg(out)
    assert d.shape[0] == 11 and d.shape[1] > 4
    assert (d[:, 1:] > 0).all()

    from groan_rs_tpu import models
    from groan_rs_tpu.system import System

    s = System.from_file(TPR)
    api = models.saltbr(s, XTC, "resname ION or resname LYS ARG GLU ASP")
    np.testing.assert_allclose(d[:, 1:], api["dist"], atol=1e-4)


def test_spol_tool(tmp_path):
    out = str(tmp_path / "spol.xvg")
    _run(["spol", "-s", TPR, "-f", XTC, "--ref", "@protein",
          "--sel", "resname W", "--rmax", "3.0", "--bins", "12",
          "-o", out])
    d = read_xvg(out)
    assert d.shape == (12, 3)
    assert d[:, 2].sum() > 0                      # counts present
    got = d[np.isfinite(d[:, 1]), 1]
    assert (np.abs(got) <= 1.0 + 1e-9).all()


def test_trjorder_tool(tmp_path):
    out = str(tmp_path / "ordered.xtc")
    ns = str(tmp_path / "nshell.xvg")
    _run(["trjorder", "-s", TPR, "-f", XTC, "--ref", "@protein",
          "--sel", "resname W", "--shell", "1.0", "--nshell-out", ns,
          "-o", out])
    assert os.path.exists(out)
    d = read_xvg(ns)
    assert d.shape == (11, 2) and (d[:, 1] > 0).all()

    # the written trajectory holds the same multiset of coordinates
    from groan_rs_tpu.system import System

    s = System.from_file(TPR)
    s2 = System.from_file(TPR)
    it1, it2 = iter(s.traj_iter(XTC)), iter(s2.traj_iter(out))
    next(it1), next(it2)
    assert not np.allclose(s.positions, s2.positions)   # reordered
    np.testing.assert_allclose(
        np.sort(s.positions.round(3), axis=0),
        np.sort(s2.positions.round(3), axis=0), atol=2e-3)


def test_hydorder_tool(tmp_path):
    out = str(tmp_path / "hyd.xvg")
    _run(["hydorder", "-s", TPR, "-f", XTC, "--sel", "resname W",
          "--slabs", "4", "-o", out])
    d = read_xvg(out)
    assert d.shape == (4, 3)
    # Martini water beads are NOT tetrahedral: just bounded order params
    assert (d[np.isfinite(d[:, 1]), 1] <= 1.0 + 1e-6).all()


def test_rotacf_tool(tmp_path):
    out = str(tmp_path / "rotacf.xvg")
    _run(["rotacf", "-s", TPR, "-f", XTC, "--sel", "serial 1 2 3 4",
          "-P", "2", "-o", out])
    d = read_xvg(out)
    assert d.shape[1] == 2
    assert d[0, 1] == pytest.approx(1.0, abs=1e-5)


def test_mdmat_tool(tmp_path):
    out = str(tmp_path / "mdmat.dat")
    _run(["mdmat", "-s", TPR, "-f", XTC, "--sel", "@protein", "-o", out])
    m = np.loadtxt(out)
    assert m.shape[0] == m.shape[1]
    assert np.allclose(np.diag(m), 0.0, atol=1e-6)
    assert np.allclose(m, m.T, atol=1e-6)


def test_leaflets_tool(tmp_path):
    out = str(tmp_path / "leaf.xvg")
    _run(["leaflets", "-s", TPR, "-f", XTC, "--sel", "name PO4",
          "-o", out])
    d = read_xvg(out)
    assert d.shape == (11, 4)
    assert (d[:, 1] > 2.0).all() and (d[:, 1] < 6.0).all()
    # balanced bilayer: upper/lower counts within 20%
    assert abs(d[:, 2].mean() - d[:, 3].mean()) < 0.2 * d[:, 2].mean()


def test_dipoles_corr_and_dielectric_tools(tmp_path):
    # dipole ACF rides the dipoles tool; uses the charged TPR fixture
    out = str(tmp_path / "m.xvg")
    co = str(tmp_path / "corr.xvg")
    _run(["dipoles", "-s", TPR, "-f", XTC, "--sel", "resname POPC",
          "-o", out, "--corr", "mol", "--corr-out", co])
    d = read_xvg(co)
    assert d.shape == (11, 2)
    assert d[0, 1] == pytest.approx(1.0, abs=1e-6)

    eo = str(tmp_path / "eps.xvg")
    _run(["dielectric", "-s", TPR, "-f", XTC, "--sel", "resname POPC",
          "--nfreq", "24", "-o", eo])
    e = read_xvg(eo)
    assert e.shape == (24, 3)
    assert np.isfinite(e).all()


def test_densorder_tool(tmp_path):
    out = str(tmp_path / "if.xvg")
    _run(["densorder", "-s", TPR, "-f", XTC, "--sel", "@membrane",
          "--bins", "50", "-o", out])
    d = read_xvg(out)
    assert d.shape == (11, 4)
    assert (d[:, 2] > d[:, 1]).all()
    assert (d[:, 3] > 2.0).all() and (d[:, 3] < 8.0).all()


def test_morph_tool(tmp_path):
    gro = os.path.join(TF, "example.gro")
    out = str(tmp_path / "morph.xtc")
    rm = str(tmp_path / "morph_rmsd.xvg")
    _run(["morph", "-s", gro, "--f2", gro, "--ninterm", "4",
          "--sel", "@protein", "-o", out, "--rmsd-out", rm])
    d = read_xvg(rm)
    assert d.shape == (4, 3)
    # identical endpoints: the whole path has zero RMSD to both
    np.testing.assert_allclose(d[:, 1:], 0.0, atol=1e-4)

    from groan_rs_tpu.system import System

    s = System.from_file(gro)
    s.group_create("P", "@protein")
    sub = s.group_extract("P")
    n = 0
    for _ in sub.traj_iter(out):
        n += 1
    assert n == 4


def test_lie_tool(tmp_path):
    from groan_rs_tpu.io.xvg import write_xvg

    src = str(tmp_path / "en.xvg")
    t = np.arange(5.0)
    elj = np.array([-40.0, -42.0, -38.0, -41.0, -39.0])
    eqq = np.array([-100.0, -90.0, -110.0, -95.0, -105.0])
    write_xvg(src, [t, elj, eqq], title="e", xlabel="t", ylabel="E",
              legends=["lj", "qq"])
    out = str(tmp_path / "lie.xvg")
    _run(["lie", "-f", src, "-o", out])
    d = read_xvg(out)
    want = 0.181 * elj + 0.5 * eqq
    np.testing.assert_allclose(d[:, 1], want, rtol=1e-5)
