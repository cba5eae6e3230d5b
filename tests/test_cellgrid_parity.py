"""CellGrid parity (src/structures/cellgrid.rs inline tests)."""

import os

import numpy as np
import pytest

from groan_rs_tpu.core.cellgrid import CellGrid, CellGridError
from groan_rs_tpu.core.shapes import Sphere
from groan_rs_tpu.system import System


@pytest.fixture(scope="module")
def example(test_files):
    return System.from_file(os.path.join(test_files, "example.gro"))


def test_too_large_cell_collapses_to_one(example):
    """cellgrid.rs test_new_cellgrid_pass_too_large_cell — a 20 nm cell on a
    ~13 nm box gives a 1x1x1 grid with cell_size == box."""
    g = CellGrid(example, "all", 20.0)
    assert list(g.ncells) == [1, 1, 1]
    box = np.asarray(example.box_lengths())
    np.testing.assert_allclose(g.cell_size, box, atol=1e-6)
    # the single cell holds every atom
    assert len(g.cell_atoms(0, 0, 0)) == example.get_n_atoms()


@pytest.mark.parametrize("size", [0.0, -1.5])
def test_invalid_cell_size(example, size):
    with pytest.raises(CellGridError):
        CellGrid(example, "all", size)


def test_no_simbox_fails(example):
    s = example.copy()
    s.set_box(None)
    with pytest.raises(CellGridError):
        CellGrid(s, "all", 1.0)


def test_nonexistent_group_fails(example):
    with pytest.raises(CellGridError):
        CellGrid(example, "Nonexistent", 1.0)


def test_atoms_at_edges(example):
    """cellgrid.rs test_new_cellgrid_at_edges — atoms exactly at/over the
    box edge land in a valid cell (wrap + clamp)."""
    s = example.copy()
    box = np.asarray(s.box_lengths())
    s.positions[0] = box            # exactly the far corner
    s.positions[1] = [0.0, 0.0, 0.0]
    s.positions[2] = box + 0.0001   # just over
    g = CellGrid(s, "all", 1.0)
    total = sum(
        len(g.cell_atoms(x, y, z))
        for x in range(g.ncells[0]) for y in range(g.ncells[1])
        for z in range(g.ncells[2])
    )
    assert total == s.get_n_atoms()


def test_neighbors_match_bruteforce_sphere(example):
    """cellgrid.rs test_real_geometry_sphere — every atom within radius r of
    a probe point appears among the grid neighbors (cell = r)."""
    s = example
    r = 1.0
    probe = np.array([6.0, 6.0, 6.0], np.float32)
    g = CellGrid(s, "all", r)
    cand = set(int(i) for i in g.neighbors(probe))
    box = np.asarray(s.box_lengths(), np.float64)
    d = np.abs(s.positions.astype(np.float64) - probe)
    d = np.minimum(d, box - d)
    inside = set(np.nonzero((d ** 2).sum(1) <= r * r)[0].tolist())
    assert inside <= cand
    # and the candidates are a genuine subset of the system
    assert len(cand) < s.get_n_atoms()


def test_neighbors_full_range_covers_all(example):
    """Unbounded ranges visit each cell exactly once (no duplicates)."""
    g = CellGrid(example, "all", 4.0)
    n = g.neighbors([0.0, 0.0, 0.0],
                    x_range=(-10, 10), y_range=(-10, 10), z_range=(-10, 10))
    assert len(n) == example.get_n_atoms()
    assert len(np.unique(n)) == len(n)
