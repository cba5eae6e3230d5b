"""Utility methods: ndx handling, visual centering, labels
(reference: `src/system/utility.rs`, `src/system/labeled_atoms.rs`)."""

from __future__ import annotations

import os

import numpy as np

from ..core.dimension import Dimension
from ..errors import GroupError, LabelError, SelectError
from ..ops import pbc


class UtilityMixin:
    # ------------------------------------------------------------- ndx
    def read_ndx(self, filename):
        """reference: ndx_io.rs:39."""
        from ..io.ndx import read_ndx as _read

        _read(self, filename)

    def read_ndx_with_default(self, filename, default: str):
        """Read ndx if it exists, else fall back to `default`
        (reference: utility.rs:26)."""
        if filename is not None and os.path.isfile(str(filename)):
            self.read_ndx(filename)
        elif default is not None and os.path.isfile(str(default)):
            self.read_ndx(default)

    def write_ndx(self, filename):
        from ..io.ndx import write_ndx as _write

        _write(self, filename)

    # ------------------------------------------------------------- centering
    def atoms_center(self, reference: str, dimension: Dimension):
        """Center the reference group's estimated COG in the box
        (reference: utility.rs:109)."""
        if self.group_get_n_atoms(reference) == 0:  # raises NotFound first
            raise GroupError(f"group '{reference}' is empty", code="EmptyGroup")
        ref_center = self.group_estimate_center(reference)
        box_center = self.get_box_center()
        shift = (box_center - ref_center) * dimension.mask()
        self.atoms_translate(shift)

    def atoms_center_mass(self, reference: str, dimension: Dimension):
        """Center the reference group's estimated COM (reference: utility.rs:168)."""
        if self.group_get_n_atoms(reference) == 0:  # raises NotFound first
            raise GroupError(f"group '{reference}' is empty", code="EmptyGroup")
        ref_center = self.group_estimate_com(reference)
        box_center = self.get_box_center()
        shift = (box_center - ref_center) * dimension.mask()
        self.atoms_translate(shift)

    # ------------------------------------------------------------- labels
    def label_atom(self, label: str, index: int):
        """reference: labeled_atoms.rs:41."""
        from .core import name_is_valid

        if not name_is_valid(label):
            raise LabelError(f"invalid label name '{label}'", code="InvalidName")
        if not (0 <= index < self.get_n_atoms()):
            raise LabelError(f"atom index {index} out of range", code="IndexOutOfRange")
        import warnings

        if label in self.labeled_atoms:
            warnings.warn(
                f"label '{label}' already existed and was overwritten", UserWarning, stacklevel=2
            )
        self.labeled_atoms[label] = int(index)

    def select_and_label(self, label: str, query: str):
        """Label the single atom matching `query` (reference: labeled_atoms.rs:81)."""
        from ..select import parse_query
        from ..select.compile import evaluate_mask

        try:
            mask = evaluate_mask(parse_query(query), self)
        except SelectError as e:
            raise LabelError(f"invalid query '{query}': {e}", code="InvalidQuery") from e
        idx = np.nonzero(mask)[0]
        if idx.shape[0] != 1:
            raise LabelError(
                f"query '{query}' selected {idx.shape[0]} atoms (expected 1)",
                code="InvalidNumberOfAtoms",
            )
        self.label_atom(label, int(idx[0]))

    def label_exists(self, label: str) -> bool:
        return label in self.labeled_atoms

    def get_labeled_atom(self, label: str):
        """reference: labeled_atoms.rs:151."""
        if label not in self.labeled_atoms:
            raise LabelError(f"label '{label}' does not exist", code="NotFound")
        return self.get_atom(self.labeled_atoms[label])

    get_labeled_atom_mut = get_labeled_atom
    get_labeled_atom_copy = get_labeled_atom

    def labeled_atoms_iter(self):
        """reference: labeled_atoms.rs:219."""
        for label, idx in self.labeled_atoms.items():
            yield label, self.get_atom(idx)

    labeled_atoms_iter_mut = labeled_atoms_iter

    def unlabel_atom(self, label: str):
        if label not in self.labeled_atoms:
            raise LabelError(f"label '{label}' does not exist", code="NotFound")
        del self.labeled_atoms[label]
