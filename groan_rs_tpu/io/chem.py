"""Extra trajectory formats: DCD, Amber NetCDF, LAMMPS dump.

Plays the role of the optional chemfiles C++ dependency in the reference
(`src/io/chemfiles.rs`) with native readers instead:
- DCD: CHARMM/NAMD binary with Fortran record framing (either endianness),
  optional unit-cell records, coordinates in Angstrom -> nm.  Simulation
  step is not stored; the frame number is used and time is assumed ps
  (matching the reference's documented DCD limitations, chemfiles.rs:36).
- Amber NetCDF: via scipy's netcdf reader ('coordinates' in Angstrom).
- LAMMPSTRJ: text dump with ITEM: sections (Angstrom -> nm).
- XYZ: plain + extended XYZ (`Lattice="..."` cell, `Properties=` column
  layout, `Time=` stamp), Angstrom -> nm.
- MOL2: SYBYL/TRIPOS records; each @<TRIPOS>MOLECULE is one frame,
  optional @<TRIPOS>CRYSIN cell, Angstrom -> nm.
TNG is handled by the native container parser in `io/tng.py`.
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import ReadTrajError
from .traj import FrameBatch, FrameSource


def _box9_from_lengths_angles(a, b, c, alpha, beta, gamma):
    from ..core.simbox import SimBox

    sb = SimBox.from_lengths_angles(a, b, c, alpha, beta, gamma)
    return np.array(list(iter(sb)), np.float32)


class DcdSource(FrameSource):
    kind = "dcd"

    def __init__(self, path):
        self.path = str(path)
        try:
            with open(path, "rb") as fh:
                data = fh.read()
        except OSError:
            raise ReadTrajError(f"file '{path}' was not found", code="FileNotFound") from None
        if len(data) < 100:
            raise ReadTrajError(f"'{path}' is not a valid dcd file", code="NotDcd")

        # detect endianness from the first record marker (must be 84)
        (m_le,) = struct.unpack("<i", data[:4])
        (m_be,) = struct.unpack(">i", data[:4])
        if m_le == 84:
            self._e = "<"
        elif m_be == 84:
            self._e = ">"
        else:
            raise ReadTrajError(f"'{path}' is not a valid dcd file", code="NotDcd")
        e = self._e
        if data[4:8] != b"CORD":
            raise ReadTrajError(f"'{path}' is not a valid dcd file", code="NotDcd")

        icntrl = struct.unpack(e + "20i", data[8:88])
        nframes = icntrl[0]
        istart = icntrl[1]
        nsavc = max(icntrl[2], 1)
        (delta,) = struct.unpack(e + "f", struct.pack(e + "i", icntrl[9]))
        self.has_cell = icntrl[10] != 0

        off = 88
        (end_marker,) = struct.unpack(e + "i", data[off : off + 4])
        if end_marker != 84:
            raise ReadTrajError(f"corrupted dcd header in '{path}'", code="CorruptFrame")
        off += 4
        # title record
        (tlen,) = struct.unpack(e + "i", data[off : off + 4])
        off += 4 + tlen + 4
        # natoms record
        (nlen,) = struct.unpack(e + "i", data[off : off + 4])
        if nlen != 4:
            raise ReadTrajError(f"corrupted dcd header in '{path}'", code="CorruptFrame")
        (natoms,) = struct.unpack(e + "i", data[off + 4 : off + 8])
        off += 12
        self.natoms = natoms
        self._data = data
        self._frame0 = off

        frame_size = 0
        if self.has_cell:
            frame_size += 4 + 48 + 4
        frame_size += 3 * (4 + 4 * natoms + 4)
        self._frame_size = frame_size
        avail = (len(data) - off) // frame_size
        n = min(nframes, avail) if nframes > 0 else avail
        self._n = n
        # DCD carries no step; frame number is used (reference behaviour);
        # time assumed ps: istart + i*nsavc in units of delta
        self.steps = np.arange(n, dtype=np.int64)
        self.times = ((istart + np.arange(n) * nsavc) * delta).astype(np.float32)

    def n_frames(self) -> int:
        return self._n

    def read_batch(self, frame_ids, stop_after=None):
        e = self._e
        natoms = self.natoms
        stop = stop_after if stop_after is not None else natoms
        ids = np.asarray(frame_ids)
        b = len(ids)
        pos = np.empty((b, stop, 3), np.float32)
        boxes = np.zeros((b, 9), np.float32)
        for k, fid in enumerate(ids):
            off = self._frame0 + int(fid) * self._frame_size
            if self.has_cell:
                u = struct.unpack(e + "6d", self._data[off + 4 : off + 52])
                a, g_, bb, be_, al, c = u
                def ang(v):
                    return float(np.degrees(np.arccos(np.clip(v, -1, 1)))) if abs(v) <= 1 else v
                boxes[k] = _box9_from_lengths_angles(
                    a / 10.0, bb / 10.0, c / 10.0, ang(al), ang(be_), ang(g_)
                )
                off += 56
            for axis in range(3):
                arr = np.frombuffer(self._data, e + "f4", natoms, off + 4)
                pos[:, :, axis][k] = arr[:stop]
                off += 4 + 4 * natoms + 4
        pos /= 10.0
        return FrameBatch(
            positions=pos, boxes9=boxes, steps=self.steps[ids], times=self.times[ids],
            frame_numbers=ids.astype(np.int64),
        )


class NetCdfSource(FrameSource):
    kind = "nc"

    def __init__(self, path):
        self.path = str(path)
        try:
            from scipy.io import netcdf_file
        except ImportError:  # pragma: no cover
            raise ReadTrajError("scipy is required for Amber NetCDF", code="Unsupported") from None
        try:
            nc = netcdf_file(str(path), "r", mmap=False)
        except Exception:
            raise ReadTrajError(f"could not open '{path}' as NetCDF", code="NotNetCdf") from None
        self._nc = nc
        if "coordinates" not in nc.variables:
            raise ReadTrajError(f"'{path}' has no coordinates", code="NotNetCdf")
        coords = nc.variables["coordinates"]
        self._n = coords.shape[0]
        self.natoms = coords.shape[1]
        # reference behaviour: step = frame number; time not read
        self.steps = np.arange(self._n, dtype=np.int64)
        self.times = np.zeros(self._n, np.float32)

    def n_frames(self) -> int:
        return self._n

    def read_batch(self, frame_ids, stop_after=None):
        ids = np.asarray(frame_ids)
        stop = stop_after if stop_after is not None else self.natoms
        coords = self._nc.variables["coordinates"]
        pos = np.asarray(coords[ids, :stop, :], np.float32) / 10.0
        boxes = np.zeros((len(ids), 9), np.float32)
        if "cell_lengths" in self._nc.variables:
            cl = np.asarray(self._nc.variables["cell_lengths"][ids], np.float64) / 10.0
            ca = (
                np.asarray(self._nc.variables["cell_angles"][ids], np.float64)
                if "cell_angles" in self._nc.variables
                else np.full((len(ids), 3), 90.0)
            )
            for k in range(len(ids)):
                boxes[k] = _box9_from_lengths_angles(*cl[k], *ca[k])
        return FrameBatch(
            positions=pos, boxes9=boxes, steps=self.steps[ids], times=self.times[ids],
            frame_numbers=ids.astype(np.int64),
        )


_LAMMPS_TIME_TO_PS = {
    # reference: chemfiles.rs lammps_time_convert:413-428 (unit -> ps factor)
    "lj": 1.0, "real": 1e-3, "metal": 1.0, "si": 1e12, "cgs": 1e12,
    "electron": 1e-3, "micro": 1e6, "nano": 1e3,
}


def _lammps_time_to_ps(time: float, units) -> float:
    if units is None:
        return float(time)
    try:
        return float(time) * _LAMMPS_TIME_TO_PS[units]
    except KeyError:
        raise ReadTrajError(f"unknown LAMMPS units '{units}'", code="UnknownUnits") from None


class LammpsSource(FrameSource):
    kind = "lammpstrj"

    def __init__(self, path):
        self.path = str(path)
        try:
            with open(path) as fh:
                raw = fh.read().splitlines()
        except OSError:
            raise ReadTrajError(f"file '{path}' was not found", code="FileNotFound") from None

        # section-driven parse: ITEM: headers with arbitrary optional
        # sections (UNITS, TIME) and triclinic BOX BOUNDS with tilt factors
        frames = []
        i = 0
        natoms = None
        cur = {}
        n_lines = len(raw)
        while i < n_lines:
            line = raw[i]
            if not line.strip():
                i += 1
                continue
            if not line.startswith("ITEM:"):
                raise ReadTrajError(f"invalid lammpstrj '{path}'", code="NotLammps")
            item = line[5:].strip()
            if item == "UNITS":
                cur["units"] = raw[i + 1].strip()
                i += 2
            elif item == "TIME":
                cur["time"] = float(raw[i + 1])
                i += 2
            elif item == "TIMESTEP":
                cur["step"] = int(raw[i + 1])
                i += 2
            elif item.startswith("NUMBER OF ATOMS"):
                n = int(raw[i + 1])
                if natoms is None:
                    natoms = n
                elif natoms != n:
                    raise ReadTrajError("inconsistent atom count", code="AtomsNumberMismatch")
                cur["n"] = n
                i += 2
            elif item.startswith("BOX BOUNDS"):
                tilted = "xy" in item
                rows = [[float(v) for v in raw[i + 1 + k].split()] for k in range(3)]
                cur["bounds"] = (rows, tilted)
                i += 4
            elif item.startswith("ATOMS"):
                cols = item.split()[1:]
                n = cur.get("n", 0)
                body = raw[i + 1 : i + 1 + n]
                frames.append(
                    (cur.get("step", len(frames)), cur.get("time"), cur.get("bounds"),
                     cols, body, cur.get("units"))
                )
                cur = {}
                i += 1 + n
            else:
                i += 2  # unknown single-value section

        self.natoms = natoms or 0
        self._frames = frames
        self.steps = np.array([f[0] for f in frames], np.int64)
        self.times = np.array(
            [_lammps_time_to_ps(f[1], f[5]) if f[1] is not None else k
             for k, f in enumerate(frames)], np.float32
        )

    def n_frames(self) -> int:
        return len(self._frames)

    @staticmethod
    def _box9(bounds) -> np.ndarray:
        rows, tilted = bounds
        if not tilted:
            lx = (rows[0][1] - rows[0][0]) / 10.0
            ly = (rows[1][1] - rows[1][0]) / 10.0
            lz = (rows[2][1] - rows[2][0]) / 10.0
            return np.array([lx, ly, lz, 0, 0, 0, 0, 0, 0], np.float32)
        (xlo_b, xhi_b, xy), (ylo_b, yhi_b, xz), (zlo_b, zhi_b, yz) = (
            rows[0][:3], rows[1][:3], rows[2][:3],
        )
        # chemfiles-written dumps store plain lo/hi (not LAMMPS's
        # tilt-adjusted bounds); the reference reads via chemfiles, so
        # follow that convention
        lx = (xhi_b - xlo_b) / 10.0
        ly = (yhi_b - ylo_b) / 10.0
        lz = (zhi_b - zlo_b) / 10.0
        return np.array(
            [lx, ly, lz, 0.0, 0.0, xy / 10.0, 0.0, xz / 10.0, yz / 10.0], np.float32
        )

    def read_batch(self, frame_ids, stop_after=None):
        ids = np.asarray(frame_ids)
        stop = stop_after if stop_after is not None else self.natoms
        pos = np.zeros((len(ids), stop, 3), np.float32)
        boxes = np.zeros((len(ids), 9), np.float32)
        for k, fid in enumerate(ids):
            step, time, bounds, cols, body, _units = self._frames[int(fid)]
            ci = {c: j for j, c in enumerate(cols)}
            names = None
            for cand in (("x", "y", "z"), ("xu", "yu", "zu")):
                if all(c in ci for c in cand):
                    names = cand
                    break
            if names is None:
                raise ReadTrajError("lammpstrj lacks coordinate columns", code="NotLammps")
            xi, yi, zi = (ci[c] for c in names)
            idc = ci.get("id")
            arr = np.array([l.split() for l in body], dtype=object)
            vals = arr[:, [xi, yi, zi]].astype(np.float64)
            if idc is not None:
                order = np.argsort(arr[:, idc].astype(np.int64))
                vals = vals[order]
            pos[k] = vals[:stop] / 10.0
            if bounds is not None:
                boxes[k] = self._box9(bounds)
        return FrameBatch(
            positions=pos, boxes9=boxes, steps=self.steps[ids], times=self.times[ids],
            frame_numbers=ids.astype(np.int64),
        )


class XyzSource(FrameSource):
    """Multi-frame XYZ / extended-XYZ trajectory reader.

    The reference reads XYZ through chemfiles ("all trajectory formats
    supported by chemfiles can be read", src/io/chemfiles.rs:27); this is
    the native equivalent.  Per-frame blocks are ``natoms\\ncomment\\n``
    followed by ``symbol x y z`` lines in Angstrom (-> nm).  Extended-XYZ
    comment metadata is honored:

    - ``Lattice="ax ay az bx by bz cx cy cz"`` (row-major cell vectors,
      Angstrom) -> per-frame box via lengths+angles, matching chemfiles'
      UnitCell representation (arbitrary lattices are rotated into the
      Gromacs lower-triangular convention, like every other reader here);
    - ``Properties=species:S:1:pos:R:3:...`` -> locates the coordinate
      columns when they do not directly follow the species column;
    - ``Time=...`` -> simulation time (assumed ps).  Otherwise, plain-XYZ
      frames carry no step/time: the frame number is used and time is 0,
      the convention the reference documents for step-less chemfiles
      formats (chemfiles.rs:37-40).
    """

    kind = "xyz"

    def __init__(self, path):
        self.path = str(path)
        try:
            with open(path) as fh:
                raw = fh.read().splitlines()
        except OSError:
            raise ReadTrajError(f"file '{path}' was not found", code="FileNotFound") from None

        frames = []  # (comment, body_lines)
        i = 0
        n_lines = len(raw)
        natoms = None
        while i < n_lines:
            if not raw[i].strip():
                i += 1
                continue
            try:
                n = int(raw[i].strip())
            except ValueError:
                raise ReadTrajError(
                    f"invalid xyz file '{path}': expected an atom count at "
                    f"line {i + 1}", code="NotXyz") from None
            if n < 0 or i + 1 >= n_lines:
                raise ReadTrajError(
                    f"truncated xyz frame in '{path}'", code="CorruptFrame")
            comment = raw[i + 1]
            body = raw[i + 2 : i + 2 + n]
            if len(body) != n:
                raise ReadTrajError(
                    f"truncated xyz frame in '{path}'", code="CorruptFrame")
            if natoms is None:
                natoms = n
            elif natoms != n:
                raise ReadTrajError(
                    "inconsistent atom count between xyz frames",
                    code="AtomsNumberMismatch")
            frames.append((comment, body))
            i += 2 + n

        if not frames:
            raise ReadTrajError(f"'{path}' contains no xyz frames", code="NotXyz")
        self.natoms = natoms or 0
        self._frames = frames
        self.steps = np.arange(len(frames), dtype=np.int64)
        times = np.zeros(len(frames), np.float32)
        for k, (comment, _) in enumerate(frames):
            t = self._comment_fields(comment).get("time")
            if t is not None:
                try:
                    times[k] = float(t)
                except ValueError:
                    pass
        self.times = times

    def n_frames(self) -> int:
        return len(self._frames)

    @staticmethod
    def _comment_fields(comment: str) -> dict:
        """key=value pairs of an extxyz comment (values may be quoted)."""
        import re

        return {
            m.group(1).lower(): (m.group(2) or m.group(3))
            for m in re.finditer(r'(\w+)=(?:"([^"]*)"|(\S+))', comment)
        }

    @staticmethod
    def _pos_column(fields: dict) -> int:
        """First coordinate column (0-based, counting the species column)."""
        props = fields.get("properties")
        if not props:
            return 1
        col = 0
        parts = props.split(":")
        for j in range(0, len(parts) - 2, 3):
            name, _typ, width = parts[j], parts[j + 1], parts[j + 2]
            try:
                w = int(width)
            except ValueError:
                return 1
            if name == "pos":
                return col
            col += w
        return 1

    @staticmethod
    def _box9(lattice: str) -> np.ndarray | None:
        vals = lattice.split()
        if len(vals) != 9:
            return None
        try:
            h = np.array([float(v) for v in vals], np.float64).reshape(3, 3)
        except ValueError:
            return None
        if not np.isfinite(h).all() or np.abs(np.linalg.det(h)) < 1e-12:
            return None
        la, lb, lc = (np.linalg.norm(h[j]) / 10.0 for j in range(3))

        def ang(u, v):
            c = np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v))
            return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))

        return _box9_from_lengths_angles(
            la, lb, lc, ang(h[1], h[2]), ang(h[0], h[2]), ang(h[0], h[1])
        )

    def read_batch(self, frame_ids, stop_after=None):
        ids = np.asarray(frame_ids)
        stop = stop_after if stop_after is not None else self.natoms
        pos = np.zeros((len(ids), stop, 3), np.float32)
        boxes = np.zeros((len(ids), 9), np.float32)
        for k, fid in enumerate(ids):
            comment, body = self._frames[int(fid)]
            fields = self._comment_fields(comment)
            c0 = self._pos_column(fields)
            try:
                vals = np.array(
                    [l.split()[c0 : c0 + 3] for l in body[:stop]], np.float64
                )
                if vals.shape != (stop, 3):
                    raise ValueError
            except ValueError:
                raise ReadTrajError(
                    f"invalid xyz coordinate line in '{self.path}'",
                    code="CorruptFrame") from None
            pos[k] = vals / 10.0
            lat = fields.get("lattice")
            if lat is not None:
                b9 = self._box9(lat)
                if b9 is not None:
                    boxes[k] = b9
        return FrameBatch(
            positions=pos, boxes9=boxes, steps=self.steps[ids],
            times=self.times[ids], frame_numbers=ids.astype(np.int64),
        )


class Mol2Source(FrameSource):
    """SYBYL MOL2 trajectory reader.

    The reference reads mol2 through chemfiles (src/io/chemfiles.rs:27);
    this is the native equivalent.  Each ``@<TRIPOS>MOLECULE`` record is
    one frame (chemfiles' convention for multi-molecule files); the
    ``@<TRIPOS>ATOM`` section carries ``id name x y z type ...`` with
    coordinates in Angstrom (-> nm); an optional ``@<TRIPOS>CRYSIN``
    record (``a b c alpha beta gamma spgrp setting``) provides the cell.
    MOL2 carries no step/time: frame number is used and time is 0
    (the step-less chemfiles convention, chemfiles.rs:37-40).
    """

    kind = "mol2"

    def __init__(self, path):
        self.path = str(path)
        try:
            with open(path) as fh:
                raw = fh.read().splitlines()
        except OSError:
            raise ReadTrajError(f"file '{path}' was not found", code="FileNotFound") from None

        frames = []  # (atom_lines, crysin_or_None)
        natoms = None
        i = 0
        n_lines = len(raw)
        while i < n_lines:
            line = raw[i].strip()
            if line != "@<TRIPOS>MOLECULE":
                if line and not line.startswith("#") and natoms is None and not frames:
                    # content before the first MOLECULE record
                    raise ReadTrajError(
                        f"'{path}' is not a valid mol2 file", code="NotMol2")
                i += 1
                continue
            # MOLECULE record: name line, then counts line (natoms [nbonds ...])
            if i + 2 >= n_lines:
                raise ReadTrajError(
                    f"truncated mol2 record in '{path}'", code="CorruptFrame")
            try:
                n = int(raw[i + 2].split()[0])
            except (ValueError, IndexError):
                raise ReadTrajError(
                    f"invalid mol2 counts line in '{path}'",
                    code="NotMol2") from None
            if natoms is None:
                natoms = n
            elif natoms != n:
                raise ReadTrajError(
                    "inconsistent atom count between mol2 molecules",
                    code="AtomsNumberMismatch")
            # scan this record's sections up to the next MOLECULE
            j = i + 3
            atoms = None
            crysin = None
            while j < n_lines and raw[j].strip() != "@<TRIPOS>MOLECULE":
                sec = raw[j].strip()
                if sec == "@<TRIPOS>ATOM":
                    atoms = raw[j + 1 : j + 1 + n]
                    if len(atoms) != n or any(
                        a.strip().startswith("@<TRIPOS>") for a in atoms
                    ):
                        raise ReadTrajError(
                            f"truncated mol2 ATOM section in '{path}'",
                            code="CorruptFrame")
                    j += 1 + n
                elif sec == "@<TRIPOS>CRYSIN":
                    if j + 1 < n_lines:
                        crysin = raw[j + 1]
                    j += 2
                else:
                    j += 1
            if atoms is None:
                raise ReadTrajError(
                    f"mol2 molecule without ATOM section in '{path}'",
                    code="CorruptFrame")
            frames.append((atoms, crysin))
            i = j

        if not frames:
            raise ReadTrajError(f"'{path}' contains no mol2 molecules", code="NotMol2")
        self.natoms = natoms or 0
        self._frames = frames
        self.steps = np.arange(len(frames), dtype=np.int64)
        self.times = np.zeros(len(frames), np.float32)

    def n_frames(self) -> int:
        return len(self._frames)

    def read_batch(self, frame_ids, stop_after=None):
        ids = np.asarray(frame_ids)
        stop = stop_after if stop_after is not None else self.natoms
        pos = np.zeros((len(ids), stop, 3), np.float32)
        boxes = np.zeros((len(ids), 9), np.float32)
        for k, fid in enumerate(ids):
            body, crysin = self._frames[int(fid)]
            try:
                vals = np.array(
                    [l.split()[2:5] for l in body[:stop]], np.float64
                )
                if vals.shape != (stop, 3):
                    raise ValueError
            except ValueError:
                raise ReadTrajError(
                    f"invalid mol2 atom line in '{self.path}'",
                    code="CorruptFrame") from None
            pos[k] = vals / 10.0
            if crysin is not None:
                parts = crysin.split()
                if len(parts) >= 6:
                    try:
                        a, b, c, al, be, ga = (float(v) for v in parts[:6])
                        boxes[k] = _box9_from_lengths_angles(
                            a / 10.0, b / 10.0, c / 10.0, al, be, ga)
                    except ValueError:
                        pass
        return FrameBatch(
            positions=pos, boxes9=boxes, steps=self.steps[ids],
            times=self.times[ids], frame_numbers=ids.astype(np.int64),
        )


def open_extra_source(path, fmt: str):
    if fmt == "dcd":
        return DcdSource(path)
    if fmt == "nc":
        return NetCdfSource(path)
    if fmt == "lammpstrj":
        return LammpsSource(path)
    if fmt == "xyz":
        return XyzSource(path)
    if fmt == "mol2":
        return Mol2Source(path)
    if fmt == "tng":  # routed to io/tng.py by open_source; kept for direct calls
        from .tng import TngSource

        return TngSource(path)
    raise ReadTrajError(f"unsupported trajectory format '{fmt}'", code="UnknownFormat")
