"""Single-structure RMSD methods (reference: `src/system/rmsd.rs:75-141`).

The trajectory RMSD path (`RMSDTrajRead::calc_rmsd`, rmsd.rs:258) lives in
the reader layer (`io/traj.py` analyzers) where frames batch onto the
device; these methods are the one-shot System-vs-System API.
"""

from __future__ import annotations

import numpy as np

from ..core.simbox import simbox_check
from ..errors import GroupError, RMSDError, SimBoxError
from ..ops import interactive
from ..ops import rmsd as rmsd_ops


def _extract(system, group: str):
    """reference: extract_data_from_system (rmsd.rs:425)."""
    try:
        box = simbox_check(system.get_box()).to_lengths_vec()
    except SimBoxError as e:
        raise RMSDError(str(e), code="InvalidSimBox") from e
    try:
        idx = system.group_indices(group)
        if idx.shape[0] == 0:  # before the COM kernel (it rejects empties)
            raise RMSDError(f"group '{group}' is empty", code="EmptyGroup")
        com = system.group_get_com(group)
    except GroupError as e:
        code = {"NotFound": "NonexistentGroup"}.get(e.code, e.code)
        raise RMSDError(str(e), code=code) from e
    pos = system.positions[idx]
    box_center = box * 0.5
    from ..ops import pbc

    with interactive.host():
        shifted = np.asarray(
            pbc.wrap(pos + (box_center - com), box), dtype=np.float32
        )
    return shifted, box_center.astype(np.float32), idx


def _masses(system, group: str, idx) -> np.ndarray:
    if not system.topology.has_mass[idx].all():
        bad = int(idx[~system.topology.has_mass[idx]][0])
        raise RMSDError(f"atom {bad} has no mass", code="InvalidMass")
    return system.topology.mass[idx]


class RMSDMixin:
    def calc_rmsd_rot_trans(self, reference, group: str):
        """Rotation, translation and RMSD vs a reference system
        (reference: rmsd.rs:141)."""
        ref_coords, ref_center, ref_idx = _extract(reference, group)
        tgt_coords, tgt_center, tgt_idx = _extract(self, group)
        if ref_coords.shape[0] != tgt_coords.shape[0]:
            raise RMSDError(
                f"group '{group}' has {ref_coords.shape[0]} atoms in reference "
                f"but {tgt_coords.shape[0]} in target",
                code="InconsistentGroup",
            )
        w = _masses(reference, group, ref_idx)
        with interactive.host():
            rot, trans, rms = rmsd_ops.kabsch(
                ref_coords, tgt_coords, w, ref_center, tgt_center
            )
        return np.asarray(rot), np.asarray(trans), float(rms)

    def calc_rmsd(self, reference, group: str) -> float:
        """Mass-weighted Kabsch RMSD (reference: rmsd.rs:75)."""
        return self.calc_rmsd_rot_trans(reference, group)[2]

    def calc_rmsd_and_fit(self, reference, group: str) -> float:
        """RMSD + fit this system onto the reference (reference: rmsd.rs:129)."""
        rot, _, rms = self.calc_rmsd_rot_trans(reference, group)
        ref_com = reference.group_get_com(group)
        self._apply_fit(group, rot, ref_com)
        return rms

    def _apply_fit(self, group: str, rotation, ref_group_com):
        """reference: fit_structure (rmsd.rs:508)."""
        box = simbox_check(self.get_box()).to_lengths_vec()
        group_com = self.group_get_com(group)
        with interactive.host():
            new_pos = rmsd_ops.fit_transform(
                self.positions, box, group_com, rotation,
                np.asarray(ref_group_com, np.float32),
            )
        # np.array (not asarray): a view of a jax buffer is read-only and
        # the next frame's _update_system writes in place
        self.positions = np.array(new_pos, dtype=np.float32)
