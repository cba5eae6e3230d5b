"""File-type detection (reference: `src/files.rs:16,55`)."""

from __future__ import annotations

import enum
import os

from .errors import FileTypeError


class FileType(enum.Enum):
    UNKNOWN = "unknown"
    GRO = "gro"
    PDB = "pdb"
    PQR = "pqr"
    TPR = "tpr"
    NDX = "ndx"
    XTC = "xtc"
    TRR = "trr"
    YAML = "yaml"
    TNG = "tng"
    DCD = "dcd"
    LAMMPSTRJ = "lammpstrj"
    AMBER_NETCDF = "nc"
    XYZ = "xyz"
    MOL2 = "mol2"

    @classmethod
    def from_name(cls, path) -> "FileType":
        """Extension sniffing (reference: files.rs:55)."""
        ext = os.path.splitext(str(path))[1].lower().lstrip(".")
        table = {
            "gro": cls.GRO,
            "pdb": cls.PDB,
            "pqr": cls.PQR,
            "tpr": cls.TPR,
            "ndx": cls.NDX,
            "xtc": cls.XTC,
            "trr": cls.TRR,
            "yaml": cls.YAML,
            "yml": cls.YAML,
            "tng": cls.TNG,
            "dcd": cls.DCD,
            "lammpstrj": cls.LAMMPSTRJ,
            "nc": cls.AMBER_NETCDF,
            "xyz": cls.XYZ,
            "mol2": cls.MOL2,
        }
        return table.get(ext, cls.UNKNOWN)

    @classmethod
    def from_name_strict(cls, path) -> "FileType":
        ft = cls.from_name(path)
        if ft is cls.UNKNOWN:
            raise FileTypeError(f"unknown file type of '{path}'")
        return ft
