#!/usr/bin/env python
"""Scattering, maps, free energy, and system preparation — the
round-4 session-7 surpass suite on the reference fixture corpus.

- SAXS/SANS Debye curves of the peptide (`models.saxs` / `models.sans`,
  gmx saxs/sans semantics: Cromer-Mann X-ray form factors and Sears
  neutron scattering lengths over one row-tiled device Debye kernel)
- 2D density map of the lipid phosphates (`models.densmap`,
  gmx-densmap semantics: fractional bins, NPT-exact)
- 3D solvent SDF around the peptide (`models.sdf`, gmx-spatial
  semantics) written as a Gaussian cube file
- Van Hove self-correlation of water (`models.vanhove`)
- water orientation around the peptide (`models.sorient`) and per slab
  (`models.h2order`)
- free volume fraction (`models.freevolume`) and distance-matrix RMS
  deviation (`models.rmsdist`)
- WHAM PMF from synthetic umbrella windows (`models.wham`)
- a preparation pipeline: insert a molecule, solvate, add ions
  (`models.insert_molecules` / `models.solvate` / `models.genion`)
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groan_rs_tpu import models
from groan_rs_tpu.system import System

TF = "/root/reference/test_files"


def main():
    s = System.from_file(os.path.join(TF, "aa_membrane_peptide.tpr"))
    s.guess_elements()
    xtc = os.path.join(TF, "aa_membrane_peptide.xtc")
    s.group_create("Pep", "@protein")

    q = np.linspace(0.5, 8.0, 12)
    sx = models.saxs(s, xtc, "Pep", q=q, batch_size=8)
    sn = models.sans(s, xtc, "Pep", q=q, batch_size=8)
    print(f"SAXS  I(q0)={sx['intensity'][0]:.0f} e^2   "
          f"I(0) bound {sx['i0']:.0f}")
    print(f"SANS  I(q0)={sn['intensity'][0]:.0f} fm^2  "
          f"(deuterated x{models.sans(s, xtc, 'Pep', q=q, batch_size=8, deuterate=True)['intensity'][0] / sn['intensity'][0]:.1f})")

    dm = models.densmap(s, xtc, "name P", axes="xz", bins=(16, 32),
                        batch_size=8)
    cols = dm["counts"].sum(axis=0)
    print(f"densmap: P atoms in 2 leaflet bands, peak z-bin "
          f"{int(np.argmax(cols))}/32")

    sd = models.sdf(s, xtc, "resname SOL and name OW", "Pep",
                    side=3.0, bins=16, batch_size=8)
    with tempfile.TemporaryDirectory() as td:
        cube = os.path.join(td, "sdf.cube")
        models.write_cube(cube, sd["grid"], sd["origin"], sd["voxel"])
        print(f"SDF: occupancy {sd['occupancy']:.3f}, cube "
              f"{os.path.getsize(cube) // 1024} KiB")

    vh = models.vanhove(s, xtc, "Pep", lags=[1, 5, 10], r_max=2.0,
                        bins=40, batch_size=8)
    print(f"vanhove: <Gs> peak r at lag 1: "
          f"{vh['r'][np.argmax(vh['gs'][0])]:.3f} nm")

    so = models.sorient(s, xtc, "Pep", oxygen="resname SOL and name OW",
                        hydrogens="resname SOL and name HW1 HW2",
                        rmax=1.2, batch_size=8)
    print(f"sorient: {int(so['n_selected'])} shell waters, "
          f"<cos theta1> {so['mean_cos1']:.3f}")

    h2 = models.h2order(s, xtc, oxygen="resname SOL and name OW",
                        hydrogens="resname SOL and name HW1 HW2",
                        bins=24, batch_size=8)
    ok = h2["count"] > 0
    print(f"h2order: {int(ok.sum())}/24 slabs occupied, max |cos| "
          f"{np.nanmax(np.abs(h2['cos'][ok])):.3f}")

    s.group_create("NoIons", "not resname NA CL")
    fv = models.freevolume(s, xtc, "NoIons", n_samples=1024,
                           batch_size=8)
    print(f"freevolume: {fv['mean_fraction']:.3f} "
          f"+- {fv['stderr_fraction']:.3f}")

    rd = models.rmsdist(s, xtc, "Pep", batch_size=8)
    print(f"rmsdist: mean {rd['rmsdist'].mean():.4f} nm over "
          f"{rd['rmsdist'].shape[0]} frames")

    # WHAM on synthetic umbrella windows sampling a known flat PMF
    rng = np.random.default_rng(1)
    kt = 0.00831446261815324 * 300
    windows = [{"samples": rng.normal(x0, np.sqrt(kt / 400.0), 20000),
                "center": x0, "k": 400.0}
               for x0 in np.linspace(-1, 1, 13)]
    wh = models.wham(windows, bins=50, span=(-1.1, 1.1))
    mid = np.abs(wh["x"]) < 0.8
    print(f"wham: converged={wh['converged']} in {wh['n_iter']} iters, "
          f"flat-PMF residual {np.nanmax(wh['pmf'][mid]):.3f} kJ/mol")

    # preparation pipeline on a synthetic box
    from groan_rs_tpu.core.simbox import SimBox
    from groan_rs_tpu.core.topology import StrColumn, Topology

    def mono(name, pos, box):
        pos = np.asarray(pos, np.float32).reshape(-1, 3)
        t = Topology(pos.shape[0])
        t.atomnum = np.arange(1, pos.shape[0] + 1, dtype=np.int64)
        t.resnum = np.ones(pos.shape[0], np.int64)
        t.atomname = StrColumn(values=np.asarray([name] * pos.shape[0]))
        t.resname = StrColumn(values=np.asarray([name] * pos.shape[0]))
        return System(name, t, simbox=SimBox.from_lengths(*box),
                      positions=pos)

    host = mono("BIG", [[2.0, 2.0, 2.0]], (4.0, 4.0, 4.0))
    mol = mono("LIG", [[0, 0, 0], [0.15, 0, 0]], (1.0, 1.0, 1.0))
    host, n_ins = models.insert_molecules(host, mol, 3, radius=0.3,
                                          seed=1)
    coords, resnums, names = [], [], []
    r = 1
    for i in range(2):
        for j in range(2):
            for k in range(2):
                o = np.array([i, j, k], np.float64) * 1.0 + 0.3
                coords.extend([o, o + [0.1, 0, 0], o + [0, 0.1, 0]])
                resnums.extend([r] * 3)
                names.extend(["OW", "HW1", "HW2"])
                r += 1
    t = Topology(len(coords))
    t.atomnum = np.arange(1, len(coords) + 1, dtype=np.int64)
    t.resnum = np.asarray(resnums, np.int64)
    t.atomname = StrColumn(values=np.asarray(names))
    t.resname = StrColumn(values=np.asarray(["SOL"] * len(coords)))
    tile = System("w", t, simbox=SimBox.from_lengths(2, 2, 2),
                  positions=np.asarray(coords, np.float32))
    solvated, n_w = models.solvate(host, tile, radius=0.3)
    final, ions = models.genion(solvated, 1, 1, seed=2)
    print(f"prep: +{n_ins} ligands, +{n_w} waters, +{len(ions)} ions "
          f"-> {final.get_n_atoms()} atoms")


if __name__ == "__main__":
    main()
