"""Iteration methods (reference: `src/system/iterating.rs`).

Python iterators over `Atom` views for API parity; hot code should use the
index/mask arrays (`group_indices`, `group_mask`) and the batched ops
instead of per-atom iteration.
"""

from __future__ import annotations

import numpy as np

from ..core.atom import Atom
from ..errors import AtomError, GroupError, SelectError


class IteratingMixin:
    def group_iter(self, name: str):
        """Iterate atoms of a group (reference: iterating.rs:43)."""
        for i in self.group_indices(name):
            yield Atom(self, int(i))

    group_iter_mut = group_iter

    def selection_iter(self, query: str):
        """Parse a query and iterate matching atoms (reference: iterating.rs:352)."""
        from ..select import parse_query
        from ..select.compile import evaluate_mask

        try:
            mask = evaluate_mask(parse_query(query), self)
        except SelectError as e:
            raise GroupError(f"invalid query '{query}': {e}", code="InvalidQuery") from e
        for i in np.nonzero(mask)[0]:
            yield Atom(self, int(i))

    selection_iter_mut = selection_iter

    def bonded_atoms_iter(self, index: int):
        """Iterate atoms bonded to `index` (reference: iterating.rs:170)."""
        if not (0 <= index < self.get_n_atoms()):
            raise AtomError(f"atom index {index} out of range", code="OutOfRange")
        for j in self.topology.bonded[index]:
            yield Atom(self, int(j))

    bonded_atoms_iter_mut = bonded_atoms_iter

    def molecule_iter(self, index: int):
        """Iterate all atoms of the molecule containing `index`, in BFS
        order from `index` (reference: iterating.rs:238, BFS via
        get_molecule_indices at iterating.rs:399)."""
        for i in self.get_molecule_indices(index):
            yield Atom(self, int(i))

    molecule_iter_mut = molecule_iter

    def get_molecule_indices(self, index: int) -> list[int]:
        """BFS order over the bond graph starting at `index`
        (reference: iterating.rs:399)."""
        if not (0 <= index < self.get_n_atoms()):
            raise AtomError(f"atom index {index} out of range", code="OutOfRange")
        from collections import deque

        bonded = self.topology.bonded
        seen = {index}
        order = [index]
        queue = deque([index])
        while queue:
            a = queue.popleft()
            for b in bonded[a]:
                if b not in seen:
                    seen.add(b)
                    order.append(b)
                    queue.append(b)
        return order

    def molecule_bonds_iter(self, index: int):
        """Iterate bonds (i, j) of the molecule containing `index`, BFS
        order, each bond once (reference: iterating.rs:301)."""
        if not (0 <= index < self.get_n_atoms()):
            raise AtomError(f"atom index {index} out of range", code="OutOfRange")
        from collections import deque

        bonded = self.topology.bonded
        visited = {index}
        queue = deque([index])
        while queue:
            a = queue.popleft()
            for b in bonded[a]:
                if b not in visited:
                    visited.add(b)
                    queue.append(b)
                    yield (Atom(self, a), Atom(self, int(b)))

    # ------------------------------------------------------------- geometry filtering
    molecule_bonds_iter_mut = molecule_bonds_iter

    def atoms_filter_geometry(self, geometry):
        """Indices of atoms (with positions) inside a shape — the vectorized
        analogue of `filter_geometry` (iterators.rs:1094)."""
        box = self.box_lengths()
        ok = self.has_position & np.asarray(geometry.inside(self.positions, box))
        return np.nonzero(ok)[0]

    def group_filter_geometry(self, name: str, geometry):
        idx = self.group_indices(name)
        box = self.box_lengths()
        ok = self.has_position[idx] & np.asarray(
            geometry.inside(self.positions[idx], box)
        )
        return np.asarray(idx)[ok]


def union_iter(iter1, iter2):
    """Merge two index-ordered atom iterators, yielding each atom at most
    once in System order (reference: UnionAtomIterator, iterators.rs:660)."""
    a = next(iter1, None)
    b = next(iter2, None)
    while a is not None or b is not None:
        if b is None or (a is not None and a.get_index() < b.get_index()):
            yield a
            a = next(iter1, None)
        elif a is None or b.get_index() < a.get_index():
            yield b
            b = next(iter2, None)
        else:  # same atom in both
            yield a
            a = next(iter1, None)
            b = next(iter2, None)


def intersection_iter(iter1, iter2):
    """Yield atoms present in BOTH index-ordered iterators, in System order
    (reference: IntersectionAtomIterator, iterators.rs:758)."""
    a = next(iter1, None)
    b = next(iter2, None)
    while a is not None and b is not None:
        ia, ib = a.get_index(), b.get_index()
        if ia == ib:
            yield a
            a = next(iter1, None)
            b = next(iter2, None)
        elif ia < ib:
            a = next(iter1, None)
        else:
            b = next(iter2, None)


class PairIteratingMixin:
    def atom_pairs_iter(self, pairs):
        """Iterate (Atom, Atom) for explicit index pairs
        (reference: AtomPairIterator, iterators.rs:1612)."""
        n = self.get_n_atoms()
        for i, j in pairs:
            if not (0 <= i < n) or not (0 <= j < n):
                raise AtomError(f"atom pair ({i}, {j}) out of range", code="OutOfRange")
            yield Atom(self, int(i)), Atom(self, int(j))

    atom_pairs_iter_mut = atom_pairs_iter

    def group_union_iter(self, name1: str, name2: str):
        """Union of two groups' atoms in System order."""
        return union_iter(self.group_iter(name1), self.group_iter(name2))

    def group_intersection_iter(self, name1: str, name2: str):
        """Intersection of two groups' atoms in System order."""
        return intersection_iter(self.group_iter(name1), self.group_iter(name2))
