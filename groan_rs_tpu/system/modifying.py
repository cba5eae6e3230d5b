"""Modification methods: translate, wrap, renumber, bonds, make-whole
(reference: `src/system/modifying.rs`).

All position edits are vectorized numpy/jax over the SoA arrays; make-whole
exploits the reference's actual algorithm (modifying.rs:368-390): every atom
is placed relative to its molecule's *reference atom* via one `vector_to`,
so the whole operation is a single gather + vectorized min-image — no
per-molecule BFS walk is needed on the device.
"""

from __future__ import annotations

import numpy as np

from ..core.dimension import Dimension
from ..core.simbox import simbox_check
from ..errors import AtomError, GroupError, PositionError, SimBoxError
from ..ops import interactive, pbc


class ModifyingMixin:
    # ------------------------------------------------------------- translation
    def group_translate(self, name: str, vector):
        """Translate group atoms and wrap into the box (reference: modifying.rs:45)."""
        idx = self.group_indices(name)
        self._translate_indices(idx, vector, group_errors=True)

    def atoms_translate(self, vector):
        """Translate all atoms and wrap (reference: modifying.rs:73)."""
        self._translate_indices(np.arange(self.get_n_atoms()), vector, group_errors=False)

    def _translate_indices(self, idx, vector, group_errors: bool):
        try:
            box = simbox_check(self.simbox).to_lengths_vec()
        except SimBoxError as e:
            if group_errors:
                raise GroupError(str(e), code="InvalidSimBox") from e
            raise AtomError(str(e), code="InvalidSimBox") from e
        if not self.has_position[idx].all():
            bad = int(np.asarray(idx)[~self.has_position[idx]][0])
            raise PositionError(f"atom {bad} has no position")
        moved = self.positions[idx] + np.asarray(vector, np.float32)
        with interactive.host():
            self.positions[idx] = np.asarray(pbc.wrap(moved, box))

    def atoms_translate_nopbc(self, vector):
        self.positions[self.has_position] += np.asarray(vector, np.float32)

    # ------------------------------------------------------------- renumbering
    def atoms_renumber(self):
        """atomnum = index + 1 (reference: modifying.rs:114)."""
        self.topology.atomnum = np.arange(1, self.get_n_atoms() + 1, dtype=np.int64)

    def residues_renumber(self):
        """Sequential residue renumbering (reference: modifying.rs:176):
        increments whenever the residue number differs from the previous
        atom's (bug-compatible, including resnum 0 on the first atom)."""
        resnum = self.topology.resnum
        if resnum.shape[0] == 0:
            return
        changes = np.empty(resnum.shape[0], dtype=np.int64)
        changes[0] = 1 if resnum[0] != 0 else 0
        changes[1:] = resnum[1:] != resnum[:-1]
        self.topology.resnum = np.cumsum(changes)

    # ------------------------------------------------------------- wrapping
    def atoms_wrap(self):
        """Wrap all atoms into the box (reference: modifying.rs:201)."""
        self._wrap_indices(np.arange(self.get_n_atoms()), group_errors=False)

    def group_wrap(self, name: str):
        """reference: modifying.rs:215."""
        idx = self.group_indices(name)
        self._wrap_indices(idx, group_errors=True)

    def _wrap_indices(self, idx, group_errors: bool):
        try:
            box = simbox_check(self.simbox).to_lengths_vec()
        except SimBoxError as e:
            if group_errors:
                raise GroupError(str(e), code="InvalidSimBox") from e
            raise AtomError(str(e), code="InvalidSimBox") from e
        if not self.has_position[idx].all():
            bad = int(np.asarray(idx)[~self.has_position[idx]][0])
            raise PositionError(f"atom {bad} has no position")
        with interactive.host():
            self.positions[idx] = np.asarray(pbc.wrap(self.positions[idx], box))

    # ------------------------------------------------------------- bonds
    def add_bond(self, index1: int, index2: int):
        """reference: modifying.rs:235."""
        self.topology.add_bond(index1, index2)

    def clear_bonds(self):
        """reference: modifying.rs:480."""
        self.topology.clear_bonds()

    def has_bonds(self) -> bool:
        return self.topology.has_bonds()

    # ------------------------------------------------------------- make whole
    def make_molecules_whole(self):
        """Fix molecules broken across PBC (reference: modifying.rs:338).

        Vectorized form of the reference algorithm: wrap each molecule's
        reference atom, then place every atom at
        `ref + vector_to(ref, atom)` — one gather + min-image over all atoms.
        """
        try:
            box = simbox_check(self.simbox).to_lengths_vec()
        except SimBoxError as e:
            raise AtomError(str(e), code="InvalidSimBox") from e
        if not self.has_position.all():
            bad = int(np.nonzero(~self.has_position)[0][0])
            raise PositionError(f"atom {bad} has no position")

        mol_ids = self.topology.molecule_ids()
        refs = self.topology.mol_references()
        with interactive.host():
            ref_pos = np.asarray(pbc.wrap(self.positions[refs], box))  # [M, 3]
            ref_per_atom = ref_pos[mol_ids]  # [N, 3]
            self.positions = np.asarray(
                ref_per_atom + pbc.vector_to(ref_per_atom, self.positions, box)
            ).astype(np.float32)

    def make_group_whole(self, group: str):
        """Make a group compact around its estimated center
        (reference: modifying.rs:447)."""
        center = self.group_estimate_center(group)  # raises for missing group/box
        box = simbox_check(self.simbox).to_lengths_vec()
        idx = self.group_indices(group)
        if not self.has_position[idx].all():
            bad = int(np.asarray(idx)[~self.has_position[idx]][0])
            raise GroupError(f"atom {bad} has no position", code="InvalidPosition")
        pos = self.positions[idx]
        with interactive.host():
            self.positions[idx] = np.asarray(
                center + pbc.vector_to(center, pos, box)
            ).astype(np.float32)
