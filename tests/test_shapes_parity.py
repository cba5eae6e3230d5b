"""Shape inside/inside_naive parity with the reference's exact point tests
(src/structures/shape.rs, 47 tests) + randomized distance-definition
equivalence."""

import numpy as np
import pytest

from groan_rs_tpu.core.dimension import Dimension
from groan_rs_tpu.core.shapes import Cylinder, Rectangular, Sphere
from groan_rs_tpu.ops import pbc

BOX5 = np.array([5.0, 5.0, 5.0], np.float32)
BOX10 = np.array([10.0, 10.0, 10.0], np.float32)
BOX4 = np.array([4.0, 4.0, 4.0], np.float32)


def _inside(shape, point, box):
    return bool(np.asarray(shape.inside(np.asarray([point], np.float32), box))[0])


def _inside_naive(shape, point):
    return bool(np.asarray(shape.inside_naive(np.asarray([point], np.float32)))[0])


# ------------------------------------------------------------- sphere

@pytest.mark.parametrize("center,radius,point,box,expect", [
    ((1, 2, 3), 1.5, (2.0, 2.5, 2.4), BOX5, True),      # inside_nopbc
    ((1, 2, 4.5), 1.5, (4.8, 2.1, 0.3), BOX5, True),    # inside across PBC
    ((1, 2, 4.5), 1.5, (4.0, 2.1, 0.3), BOX5, False),   # not inside
])
def test_sphere_inside(center, radius, point, box, expect):
    s = Sphere(center, radius)
    assert _inside(s, point, box) is expect


def test_sphere_inside_naive_values():
    assert _inside_naive(Sphere((1, 2, 3), 1.5), (2.0, 2.5, 2.4))
    assert not _inside_naive(Sphere((1, 2, 4.5), 1.5), (4.8, 2.1, 0.3))
    assert not _inside_naive(Sphere((1, 2, 4.5), 1.5), (4.0, 2.1, 0.3))


def test_sphere_inside_random_matches_distance():
    """shape.rs inside_random: inside <=> PBC distance < radius."""
    rng = np.random.default_rng(0)
    s = Sphere((1.0, 2.0, 3.0), 2.5)
    pts = rng.uniform(0, 5, size=(200, 3)).astype(np.float32)
    got = np.asarray(s.inside(pts, BOX5))
    d = np.asarray(pbc.distance(pts, np.array([1, 2, 3], np.float32), BOX5))
    np.testing.assert_array_equal(got, d < 2.5)
    got_n = np.asarray(s.inside_naive(pts))
    dn = np.asarray(pbc.distance_naive(pts, np.array([1, 2, 3], np.float32)))
    np.testing.assert_array_equal(got_n, dn < 2.5)


# ------------------------------------------------------------- rectangular

@pytest.mark.parametrize("pos,dims,point,box,pbc_in,naive_in", [
    ((1, 2, 3), (3, 2, 1), (3.1, 3.8, 3.9), BOX10, True, True),
    ((2.5, 3.1, 0.3), (1.2, 1.3, 5.0), (2.6, 4.3, 4.9), BOX10, True, True),
    ((1, 2, 3), (3, 2, 1), (4.1, 3.8, 3.9), BOX10, False, False),
    ((1, 2, 3), (3, 2, 1), (2.1, 1.9, 3.9), BOX10, False, False),
    ((1, 2, 3), (3, 2, 1), (2.1, 2.5, 4.1), BOX10, False, False),
    ((1, 2, 3), (4, 2, 1.5), (0.5, 3.8, 3.3), BOX4, True, False),  # wraps in x
    ((1, 2, 3), (1, 4, 1.5), (1.3, 1.2, 3.5), BOX4, True, False),  # wraps in y
])
def test_rectangular_inside(pos, dims, point, box, pbc_in, naive_in):
    r = Rectangular(pos, *dims)
    assert _inside(r, point, box) is pbc_in
    assert _inside_naive(r, point) is naive_in


# ------------------------------------------------------------- cylinder

@pytest.mark.parametrize("pos,radius,height,axis,point,box,pbc_in,naive_in", [
    ((2, 1, 3), 2.0, 4.0, Dimension.X, (4.2, 1.8, 2.2), BOX10, True, True),
    ((3, 3, 3), 2.0, 4.0, Dimension.X, (2.9, 3.8, 2.2), BOX10, False, False),
    ((3, 3, 3), 2.0, 4.0, Dimension.X, (3.1, 4.6, 1.2), BOX10, False, False),
    ((2, 1, 3), 2.0, 3.0, Dimension.X, (0.3, 1.4, 2.2), BOX4, True, False),
    ((2, 1, 3), 2.0, 3.0, Dimension.X, (2.4, 3.8, 2.8), BOX4, True, False),
    ((3, 3, 3), 4.0, 4.0, Dimension.Y, (5.2, 3.8, 3.2), BOX10, True, True),
])
def test_cylinder_inside(pos, radius, height, axis, point, box, pbc_in, naive_in):
    c = Cylinder(pos, radius, height, axis)
    assert _inside(c, point, box) is pbc_in
    assert _inside_naive(c, point) is naive_in


# --------------------------------------------------------- getter safety

def test_getters_do_not_alias_shape_state():
    """Shape getters return copies: mutating the returned Vector3D (the
    reference returns an immutable borrow, shape.rs) must not move the
    shape's own geometry."""
    from groan_rs_tpu.core.shapes import Sphere, TriangularPrism

    s = Sphere((1.0, 2.0, 3.0), 1.5)
    v = s.get_position()
    v.x = 99.0
    v += 1.0
    assert s.get_position().tolist() == [1.0, 2.0, 3.0]

    t = TriangularPrism((0, 0, 0), (1, 0, 0), (0, 1, 0), 2.0)
    b = t.get_base2()
    b[:] = 0
    assert t.get_base2().tolist() == [1.0, 0.0, 0.0]
