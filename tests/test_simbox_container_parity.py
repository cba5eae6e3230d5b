"""SimBox + AtomContainer parity (reference: simbox.rs / container.rs
inline tests and doc values)."""

import numpy as np
import pytest

from groan_rs_tpu.core.container import AtomContainer
from groan_rs_tpu.core.simbox import SimBox


# ------------------------------------------------------------- SimBox

def test_from_lengths_angles_orthogonal():
    """simbox.rs:248 — 90/90/90 gives a diagonal box."""
    sb = SimBox.from_lengths_angles(5.297, 4.863, 2.976, 90.0, 90.0, 90.0)
    assert sb.v1x == pytest.approx(5.297, abs=1e-5)
    assert sb.v2y == pytest.approx(4.863, abs=1e-5)
    assert sb.v3z == pytest.approx(2.976, abs=1e-5)
    for v in (sb.v1y, sb.v1z, sb.v2x, sb.v2z, sb.v3x, sb.v3y):
        assert v == pytest.approx(0.0, abs=1e-5)
    np.testing.assert_allclose(np.asarray(sb.lengths()), [5.297, 4.863, 2.976], atol=1e-4)
    np.testing.assert_allclose(np.asarray(sb.angles()), [90.0, 90.0, 90.0], atol=1e-4)
    assert sb.is_orthogonal()


def test_from_lengths_angles_triclinic():
    """simbox.rs doc values (simbox.rs:78-90): 5/4/3 nm, 80/70/120 deg."""
    sb = SimBox.from_lengths_angles(5.0, 4.0, 3.0, 80.0, 70.0, 120.0)
    assert sb.v1x == pytest.approx(5.000000, abs=1e-4)
    assert sb.v2y == pytest.approx(3.464102, abs=1e-4)
    assert sb.v3z == pytest.approx(2.553768, abs=1e-4)
    assert sb.v2x == pytest.approx(-2.000000, abs=1e-4)
    assert sb.v3x == pytest.approx(1.026060, abs=1e-4)
    assert sb.v3y == pytest.approx(1.193930, abs=1e-4)
    assert not sb.is_orthogonal()
    # round trip back to lengths/angles (simbox.rs:133-148)
    np.testing.assert_allclose(np.asarray(sb.angles()), [80.0, 70.0, 120.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(sb.lengths()), [5.0, 4.0, 3.0], atol=1e-3)


def test_simbox_matrix_roundtrip():
    sb = SimBox.from_lengths_angles(5.0, 4.0, 3.0, 80.0, 70.0, 120.0)
    m = np.asarray(sb.to_matrix())
    assert m.shape == (3, 3)
    # Gromacs convention: v1y = v1z = v2z = 0
    assert m[0, 1] == 0.0 and m[0, 2] == 0.0 and m[1, 2] == 0.0


# ------------------------------------------------------------- AtomContainer

def test_container_from_indices_dedup_sort():
    c = AtomContainer.from_indices([5, 1, 2, 3, 1, 9], 20)
    assert list(c.indices()) == [1, 2, 3, 5, 9]
    assert c.get_n_atoms() == 5
    assert c.isin(3) and not c.isin(4)


def test_container_union_intersection():
    a = AtomContainer.from_indices(range(0, 10), 100)
    b = AtomContainer.from_indices(range(5, 15), 100)
    u = a.union(b)
    assert list(u.indices()) == list(range(0, 15))
    i = a.intersection(b)
    assert list(i.indices()) == list(range(5, 10))


def test_container_blocks_are_run_length():
    c = AtomContainer.from_indices([0, 1, 2, 7, 8, 20], 100)
    assert len(c.blocks) == 3  # [0-2], [7-8], [20]
    mask = c.mask(100)
    assert mask.sum() == 6
    assert mask[0] and mask[8] and mask[20] and not mask[3]


def test_container_empty():
    c = AtomContainer.from_indices([], 10)
    assert c.get_n_atoms() == 0
    assert not c.isin(0)
    assert list(c.indices()) == []


def test_container_from_ranges_merging():
    """container.rs: overlapping/adjacent ranges merge into minimal blocks."""
    c = AtomContainer.from_ranges([(0, 5), (6, 10), (3, 7), (20, 20)], 100)
    assert list(c.indices()) == list(range(0, 11)) + [20]
    assert len(c.blocks) == 2  # [0-10], [20]


def test_container_difference_and_iter():
    a = AtomContainer.from_indices(range(0, 10), 100)
    b = AtomContainer.from_indices([2, 3, 7], 100)
    d = a.difference(b)
    assert list(d.indices()) == [0, 1, 4, 5, 6, 8, 9]
    assert list(iter(d)) == [0, 1, 4, 5, 6, 8, 9]
    assert d.first() == 0 and d.last() == 9
    assert not d.is_empty()
    assert AtomContainer.empty().is_empty()
    assert AtomContainer.empty().first() is None


def test_container_equality_and_mask_roundtrip():
    a = AtomContainer.from_indices([1, 2, 3, 10], 20)
    b = AtomContainer.from_mask(a.mask(20))
    assert a == b
    assert a.get_n_atoms() == 4


def test_container_union_disjoint_and_nested():
    a = AtomContainer.from_indices([0, 1, 2], 50)
    b = AtomContainer.from_indices([10, 11], 50)
    assert list(a.union(b).indices()) == [0, 1, 2, 10, 11]
    outer = AtomContainer.from_indices(range(0, 20), 50)
    inner = AtomContainer.from_indices(range(5, 10), 50)
    assert outer.union(inner) == outer
    assert inner.intersection(outer) == inner
    assert outer.intersection(AtomContainer.empty()).is_empty()


def test_from_lengths_angles_exact_case2():
    """simbox.rs from_lengths_angles_2 exact components + round trip."""
    sb = SimBox.from_lengths_angles(5.297, 4.863, 2.976, 120.0, 70.0, 80.0)
    assert float(sb.v1x) == pytest.approx(5.297, abs=1e-5)
    assert float(sb.v2y) == pytest.approx(4.78912, abs=1e-5)
    assert float(sb.v3z) == pytest.approx(2.2277796, abs=1e-5)
    assert float(sb.v2x) == pytest.approx(0.8444507, abs=1e-5)
    assert float(sb.v3x) == pytest.approx(1.0178516, abs=1e-5)
    assert float(sb.v3y) == pytest.approx(-1.6904297, abs=1e-5)
    lengths, angles = sb.to_lengths_angles()
    np.testing.assert_allclose(lengths, [5.297, 4.863, 2.976], atol=1e-4)
    np.testing.assert_allclose(angles, [120.0, 70.0, 80.0], atol=1e-3)


def test_from_lengths_angles_exact_case4_octahedron():
    """simbox.rs from_lengths_angles_4 — the truncated-octahedron angles."""
    sb = SimBox.from_lengths_angles(6.26832, 6.26832, 6.26832,
                                    70.53, 109.47, 70.53)
    assert float(sb.v1x) == pytest.approx(6.26832, abs=1e-5)
    assert float(sb.v2y) == pytest.approx(5.90987, abs=1e-5)
    assert float(sb.v3z) == pytest.approx(5.11825, abs=1e-5)
    assert float(sb.v2x) == pytest.approx(2.08931, abs=1e-5)
    assert float(sb.v3x) == pytest.approx(-2.08931, abs=1e-5)
    assert float(sb.v3y) == pytest.approx(2.95467, abs=1e-5)
