"""Vector3D: the reference's 3-vector type as a numpy array subclass.

reference: `src/structures/vector3d.rs` — `.x/.y/.z` fields, `len`,
`to_unit`, `invert`, `angle`, `shift`, `rotate`, `wrap`, `distance`,
`distance_naive`, `vector_to`, `filter`, `is_zero`, `average`.

The class IS a `(3,)` float32 `numpy.ndarray`, so every array API keeps
working on it and it can be passed anywhere a position is expected; the
methods delegate to the same `ops.pbc` / `ops.vecmath` kernels the
batched device paths use (values match the reference's doc tests — see
tests/test_vecmath_parity.py).  Mutating methods (`shift`, `wrap`,
`filter`) modify in place and return self, mirroring the reference's
`&mut self` signatures while staying chainable.
"""

from __future__ import annotations

import numpy as np


def _dmask(dim):
    from .dimension import Dimension

    return dim.value if isinstance(dim, Dimension) else tuple(dim)


class Vector3D(np.ndarray):
    def __new__(cls, x: float = 0.0, y: float = 0.0, z: float = 0.0):
        return np.asarray([x, y, z], dtype=np.float32).view(cls)

    @classmethod
    def from_array(cls, arr) -> "Vector3D":
        """View/convert any length-3 array as a Vector3D."""
        return np.asarray(arr, dtype=np.float32).reshape(3).view(cls)

    # ------------------------------------------------------------ fields
    @property
    def x(self) -> float:
        return float(self[0])

    @x.setter
    def x(self, v):
        self[0] = v

    @property
    def y(self) -> float:
        return float(self[1])

    @y.setter
    def y(self, v):
        self[1] = v

    @property
    def z(self) -> float:
        return float(self[2])

    @z.setter
    def z(self, v):
        self[2] = v

    # ---------------------------------------------------------- queries
    def len(self) -> float:
        """Vector magnitude (reference: vector3d.rs:214)."""
        return float(np.sqrt(np.float32(self @ self)))

    def is_zero(self) -> bool:
        """reference: vector3d.rs:626."""
        return bool((np.asarray(self) == 0.0).all())

    def angle(self, other) -> float:
        """Angle to `other` in radians (reference: vector3d.rs:276)."""
        from ..ops import vecmath

        return float(vecmath.angle(np.asarray(self), np.asarray(other)))

    def dot(self, other) -> float:
        return float(np.float32(np.asarray(self) @ np.asarray(other)))

    def cross(self, other) -> "Vector3D":
        return Vector3D.from_array(np.cross(np.asarray(self),
                                            np.asarray(other)))

    # ------------------------------------------------------- derivations
    def to_unit(self) -> "Vector3D":
        """Unit vector; a null vector returns itself
        (reference: vector3d.rs:236)."""
        n = self.len()
        if n == 0.0:
            return Vector3D.from_array(self.copy())
        return Vector3D.from_array(np.asarray(self) / np.float32(n))

    def invert(self) -> "Vector3D":
        """Reversed direction (reference: vector3d.rs:254)."""
        return Vector3D.from_array(-np.asarray(self))

    def rotate(self, rotation_matrix) -> "Vector3D":
        """Rotate by a 3x3 matrix, no PBC (reference: vector3d.rs:359)."""
        return Vector3D.from_array(
            np.asarray(rotation_matrix, np.float32) @ np.asarray(self))

    # ---------------------------------------------------------- mutators
    def shift(self, orientation, distance: float) -> "Vector3D":
        """Shift along `orientation` (need not be unit) by `distance`,
        no PBC (reference: vector3d.rs:305)."""
        from ..ops import vecmath

        self[:] = vecmath.shift(np.asarray(self), np.asarray(orientation),
                                np.float32(distance))
        return self

    def wrap(self, sbox) -> "Vector3D":
        """Wrap into the (orthogonal) box (reference: vector3d.rs:380)."""
        from ..ops import pbc

        self[:] = np.asarray(pbc.wrap(np.asarray(self),
                                      sbox.to_lengths_vec()))
        return self

    def filter(self, dim) -> "Vector3D":
        """Zero the components outside `dim` (reference: vector3d.rs:610)."""
        m = _dmask(dim)
        for i in range(3):
            if not m[i]:
                self[i] = 0.0
        return self

    # --------------------------------------------------------- distances
    def distance(self, point, dim, sbox) -> float:
        """Minimum-image distance in `dim` (reference: vector3d.rs:458)."""
        from ..ops import pbc

        return float(pbc.distance(np.asarray(self), np.asarray(point),
                                  sbox.to_lengths_vec(), _dmask(dim)))

    def distance_naive(self, point, dim) -> float:
        """No-PBC distance; 1D flavours keep their sign
        (reference: vector3d.rs:522)."""
        from ..ops import pbc

        return float(pbc.distance_naive(np.asarray(self), np.asarray(point),
                                        _dmask(dim)))

    def vector_to(self, point, sbox) -> "Vector3D":
        """Shortest PBC vector from self to `point`
        (reference: vector3d.rs:561)."""
        from ..ops import pbc

        return Vector3D.from_array(
            pbc.vector_to(np.asarray(self), np.asarray(point),
                          sbox.to_lengths_vec()))

    # ------------------------------------------------------------ static
    @staticmethod
    def average(vectors) -> "Vector3D":
        """Component mean of a collection; empty input yields the NaN
        vector like the reference's 0/0 (reference: vector3d.rs:662)."""
        vs = [np.asarray(v, np.float32) for v in vectors]
        if not vs:
            return Vector3D(np.nan, np.nan, np.nan)
        arr = np.asarray(vs, dtype=np.float32)
        return Vector3D.from_array(arr.sum(axis=0) / np.float32(len(arr)))
