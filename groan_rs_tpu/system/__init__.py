"""System assembly: the ~150-method façade of the reference `System`.

reference: `src/system/mod.rs` (struct + construction) with method families
in groups.rs / analysis.rs / modifying.rs / utility.rs / labeled_atoms.rs /
iterating.rs / rmsd.rs — here mixed into one class from sibling modules.
"""

from __future__ import annotations

import numpy as np

from ..core.simbox import SimBox
from ..core.topology import Topology
from ..errors import FileTypeError
from ..files import FileType
from .analysis import AnalysisMixin, TriclinicAnalysisMixin
from .core import (Group, GroupOverwriteWarning, SystemCore,
                   SystemExtrasMixin, name_is_valid)
from .groups import GroupsMixin
from .guess import GuessMixin
from .hbonds import HBondsMixin
from .iterating import IteratingMixin, PairIteratingMixin
from .modifying import ModifyingMixin
from .rmsd import RMSDMixin
from .utility import UtilityMixin


class System(
    GroupsMixin,
    AnalysisMixin,
    TriclinicAnalysisMixin,
    ModifyingMixin,
    IteratingMixin,
    PairIteratingMixin,
    UtilityMixin,
    RMSDMixin,
    GuessMixin,
    HBondsMixin,
    SystemCore,
    SystemExtrasMixin,
):
    """The central object: topology + current frame + groups."""

    # ------------------------------------------------------------- construction
    def group_extract(self, name: str) -> "System":
        """New System containing only the group's atoms (bond graph
        restricted + remapped; reference: System::group_extract,
        mod.rs:479 + System::new)."""
        from .core import _extract_system

        return _extract_system(self, self.group_indices(name),
                               f"Group `{name}` extracted from {self.get_name()}")

    def atoms_extract(self) -> "System":
        """New System with copies of all atoms but no custom groups
        (reference: System::atoms_extract, mod.rs:453)."""
        from .core import _extract_system

        import numpy as _np

        return _extract_system(self, _np.arange(self.get_n_atoms()),
                               self.get_name())

    @classmethod
    def from_file(cls, filename) -> "System":
        """Construct from GRO/PDB/PQR/TPR (reference: system/mod.rs:197)."""
        return cls.from_file_with_format(filename, FileType.from_name(filename))

    @classmethod
    def from_file_with_format(cls, filename, filetype: FileType) -> "System":
        """reference: system/mod.rs:226."""
        if filetype is FileType.GRO:
            from ..io.gro import read_gro

            return read_gro(filename)
        if filetype is FileType.PDB:
            from ..io.pdb import read_pdb

            return read_pdb(filename)
        if filetype is FileType.PQR:
            from ..io.pqr import read_pqr

            return read_pqr(filename)
        if filetype is FileType.TPR:
            from ..io.tpr import read_tpr

            return read_tpr(filename)
        raise FileTypeError(
            f"cannot construct a System from '{filename}' "
            f"(file type '{filetype.value}')"
        )

    @classmethod
    def new(cls, name: str, topology: Topology, simbox: SimBox | None = None, **kw) -> "System":
        return cls(name=name, topology=topology, simbox=simbox, **kw)

    # ------------------------------------------------------------- writing
    def write_gro(self, filename, write_velocities: bool = False):
        from ..io.gro import write_gro as _w

        _w(self, filename, "all", write_velocities)

    def group_write_gro(self, group: str, filename, write_velocities: bool = False):
        from ..io.gro import write_gro as _w

        _w(self, filename, group, write_velocities)

    def write_pdb(self, filename, write_conect: bool = False):
        from ..io.pdb import write_pdb as _w

        _w(self, filename, "all", write_conect)

    def group_write_pdb(self, group: str, filename, write_conect: bool = False):
        from ..io.pdb import write_pdb as _w

        _w(self, filename, group, write_conect)

    def write_pqr(self, filename, precision=None):
        from ..io.pqr import write_pqr as _w

        _w(self, filename, precision, "all")

    def group_write_pqr(self, group: str, filename, precision=None):
        from ..io.pqr import write_pqr as _w

        _w(self, filename, precision, group)

    def add_bonds_from_pdb(self, filename):
        from ..io.pdb import add_bonds_from_pdb as _b

        _b(self, filename)

    # ------------------------------------------------------------- trajectories
    def xtc_iter(self, filename, **kw):
        from ..io.traj import xtc_iter as _it

        return _it(self, filename, **kw)

    def trr_iter(self, filename, **kw):
        from ..io.traj import trr_iter as _it

        return _it(self, filename, **kw)

    def gro_iter(self, filename, **kw):
        from ..io.traj import gro_iter as _it

        return _it(self, filename, **kw)

    def tng_iter(self, filename, **kw):
        from ..io.traj import tng_iter as _it

        return _it(self, filename, **kw)

    def group_xtc_iter(self, group: str, filename, **kw):
        from ..io.traj import xtc_iter as _it

        return _it(self, filename, group=group, **kw)

    def traj_iter(self, filename, **kw):
        from ..io.traj import traj_iter as _it

        return _it(self, filename, **kw)

    def xtc_cat_iter(self, filenames, **kw):
        from ..io.traj import cat_iter as _it

        return _it(self, filenames, fmt="xtc", **kw)

    def trr_cat_iter(self, filenames, **kw):
        from ..io.traj import cat_iter as _it

        return _it(self, filenames, fmt="trr", **kw)

    def traj_cat_iter(self, filenames, **kw):
        from ..io.traj import cat_iter as _it

        return _it(self, filenames, **kw)

    def group_traj_cat_iter(self, filenames, group, **kw):
        """Concatenated iteration over one group's atoms
        (reference: traj_cat.rs:399)."""
        from ..io.traj import cat_iter as _it

        return _it(self, filenames, group=group, **kw)

    # ------------------------------------------------------------- trajectory writers
    # reference: src/io/traj_write.rs (SystemWriters registry on System)
    def traj_writer_init(self, filename, fmt=None, **kw):
        """reference: traj_write.rs:121 (+ auto-format :174)."""
        from ..errors import WriteTrajError
        from ..io.traj import make_writer

        key = str(filename)
        if key in self._traj_writers:
            raise WriteTrajError(
                f"writer for '{filename}' already exists", code="WriterAlreadyExists"
            )
        self._traj_writers[key] = make_writer(self, filename, "all", fmt, **kw)

    def group_traj_writer_init(self, group, filename, fmt=None, **kw):
        """reference: traj_write.rs:154."""
        from ..errors import WriteTrajError
        from ..io.traj import make_writer

        key = str(filename)
        if key in self._traj_writers:
            raise WriteTrajError(
                f"writer for '{filename}' already exists", code="WriterAlreadyExists"
            )
        self._traj_writers[key] = make_writer(self, filename, group, fmt, **kw)

    def traj_write_frame(self):
        """Write the current frame into every open writer
        (reference: traj_write.rs:235)."""
        for w in self._traj_writers.values():
            w.write_frame()

    # reference-named writer aliases (traj_write.rs)
    def traj_writer_auto_init(self, filename, **kw):
        """reference: traj_write.rs:174 (format from extension)."""
        return self.traj_writer_init(filename, **kw)

    def traj_group_writer_init(self, group, filename, fmt=None, **kw):
        """reference: traj_write.rs:154."""
        return self.group_traj_writer_init(group, filename, fmt, **kw)

    def traj_group_writer_auto_init(self, group, filename, **kw):
        return self.group_traj_writer_init(group, filename, **kw)

    # format-pinned conveniences (reference: xtc_io/mod.rs:236,
    # trr_io.rs:424 — thin wrappers over the generic writer init)
    def xtc_writer_init(self, filename, **kw):
        return self.traj_writer_init(filename, fmt="xtc", **kw)

    def xtc_group_writer_init(self, group, filename, **kw):
        return self.group_traj_writer_init(group, filename, fmt="xtc", **kw)

    def trr_writer_init(self, filename, **kw):
        return self.traj_writer_init(filename, fmt="trr", **kw)

    def trr_group_writer_init(self, group, filename, **kw):
        return self.group_traj_writer_init(group, filename, fmt="trr", **kw)

    def get_n_writers(self) -> int:
        return len(self._traj_writers)

    def traj_write_frame_to_file(self, filename):
        """Write the current frame to one specific writer."""
        from ..errors import WriteTrajError

        key = str(filename)
        if key not in self._traj_writers:
            raise WriteTrajError(f"no writer for '{filename}'", code="WriterNotFound")
        self._traj_writers[key].write_frame()

    def traj_close_file(self, filename):
        from ..errors import WriteTrajError

        key = str(filename)
        if key not in self._traj_writers:
            raise WriteTrajError(f"no writer for '{filename}'", code="WriterNotFound")
        self._traj_writers.pop(key).close()

    def traj_close(self):
        """reference name for closing all writers."""
        return self.traj_writers_close()

    def traj_iter_map_reduce(self, filenames, body, **kw):
        """Device-sharded map-reduce over a trajectory (the reference's
        System::traj_iter_map_reduce, parallel.rs:208)."""
        from ..parallel import traj_iter_map_reduce as _mr

        return _mr(self, filenames, body, **kw)

    traj_iter_cat_map_reduce = traj_iter_map_reduce

    def traj_writers_close(self):
        """reference: traj_write.rs:246."""
        for w in self._traj_writers.values():
            w.close()
        self._traj_writers.clear()

    def traj_writer_close(self, filename):
        """reference: traj_write.rs:257."""
        from ..errors import WriteTrajError

        key = str(filename)
        if key not in self._traj_writers:
            raise WriteTrajError(f"no writer for '{filename}'", code="WriterNotFound")
        self._traj_writers[key].close()
        del self._traj_writers[key]


__all__ = [
    "System",
    "Group",
    "GroupOverwriteWarning",
    "name_is_valid",
]
