"""PDB structure reading/writing + CONECT bonds.

reference: `src/io/pdb_io.rs` — reader `read_pdb:36`, atom columns
`line_as_atom:348` (atomnum [6:11], atomname [12:16], resname [17:21],
chain col 21, resnum [22:26], coords 3 x 8 from col 30 in Angstrom -> nm),
CRYST1 box `line_as_box:411`, CONECT bonds `add_bonds_from_pdb:128`,
writer `write_pdb:236` / atom.rs:633.
"""

from __future__ import annotations

import warnings

import numpy as np

from ..core.simbox import SimBox
from ..core.topology import Topology
from ..errors import ParsePdbError, WritePdbError

PDB_MIN_COORDINATE = -99.0
PDB_MAX_COORDINATE = 999.0


class PdbConnectivityWarning(UserWarning):
    """reference: ParsePdbConnectivityError::NoBondsWarning."""


def parse_cryst1(line: str) -> SimBox:
    """reference: pdb_io.rs line_as_box:411 (lengths in A, angles in deg)."""
    if len(line) < 54:
        raise ParsePdbError(f"could not parse box line '{line.rstrip()}'")
    try:
        lengths = [float(line[6 + 9 * i : 15 + 9 * i]) / 10.0 for i in range(3)]
        angles = [float(line[33 + 7 * i : 40 + 7 * i]) for i in range(3)]
    except ValueError:
        raise ParsePdbError(f"could not parse box line '{line.rstrip()}'") from None
    return SimBox.from_lengths_angles(*lengths, *angles)


def _parse_atom_lines_vec(lines: list[str]):
    """Vectorized ATOM/HETATM column parse (reference pdb_io.rs
    line_as_atom:348 semantics: atomnum [6:11], atomname [12:16], resname
    [17:21], chain col 21, resnum [22:26], coords 3 x 8 from col 30 in
    Angstrom -> nm); per-line errors name the offending line."""
    from ..utils.textcols import FixedWidthLines

    fw = FixedWidthLines(lines)
    lengths = fw.line_lengths()

    def bad(i, code=None):
        raise ParsePdbError(
            f"could not parse line '{lines[int(i)].rstrip()}' as atom",
            **({"code": code} if code else {}),
        )

    if (lengths < 54).any():
        bad(np.argmax(lengths < 54))

    def col_int(a, b):
        raw = fw.col_bytes(a, b)
        try:
            return raw.astype(np.int64)
        except ValueError:
            strs = np.char.strip(raw.astype(str))
            for i, v in enumerate(strs):
                try:
                    int(v)
                except ValueError:
                    bad(i)
            raise  # pragma: no cover

    atomnum = col_int(6, 11)
    atomname = np.char.strip(fw.col_bytes(12, 16))
    resname = np.char.strip(fw.col_bytes(17, 21))
    empty = (np.char.str_len(atomname) == 0) | (np.char.str_len(resname) == 0)
    if empty.any():
        bad(np.argmax(empty))
    col21 = fw.mat[:, 21].view(np.uint8)
    has_chain = (col21 != 0x20) & (col21 != 0)
    chain = np.where(has_chain, fw.col_bytes(21, 22), b"")
    resnum = col_int(22, 26)

    cols = []
    for k in range(3):
        raw = fw.col_bytes(30 + 8 * k, 38 + 8 * k)
        try:
            v = raw.astype(np.float64)
        except ValueError:
            strs = np.char.strip(raw.astype(str))
            for i, s in enumerate(strs):
                try:
                    float(s)
                except ValueError:
                    bad(i)
            raise  # pragma: no cover
        cols.append(v / 10.0)
    pos = np.stack(cols, axis=1).astype(np.float32)
    if not np.isfinite(pos).all():
        bad(np.argmax(~np.isfinite(pos).all(axis=1)), code="InvalidFloat")
    if (atomnum < 0).any() or (resnum < 0).any():
        bad(np.argmax((atomnum < 0) | (resnum < 0)))
    return resnum, resname, atomname, atomnum, chain, pos


def read_pdb(filename):
    """reference: pdb_io.rs read_pdb:36."""
    from ..system import System

    try:
        with open(filename) as fh:
            raw = fh.read().splitlines()
    except OSError:
        raise ParsePdbError(f"file '{filename}' was not found", code="FileNotFound") from None

    atom_lines = []
    title = "Unknown"
    simbox = None
    for line in raw:
        if line.startswith("ATOM") or line.startswith("HETATM"):
            atom_lines.append(line)
        elif line.startswith("TITLE"):
            t = line[5:].strip()
            title = t if t else "Unknown"
        elif line.startswith("CRYST1"):
            simbox = parse_cryst1(line)
        elif line.startswith("END"):  # END or ENDMDL
            break

    n = len(atom_lines)
    if n:
        resnum, resname, atomname, atomnum, chain, pos = _parse_atom_lines_vec(
            atom_lines)
    else:
        resnum = atomnum = np.empty(0, np.int64)
        resname = atomname = chain = np.empty(0, object)
        pos = np.empty((0, 3), np.float32)

    topo = Topology.from_columns(resnum, resname, atomname, atomnum, chain=chain)
    return System(name=title, topology=topo, simbox=simbox, positions=pos)


def add_bonds_from_pdb(system, filename):
    """Read CONECT records and set bonds (reference: pdb_io.rs:128).

    Bonds reference *atom numbers* from the PDB file; accepts CONECT lines
    of any length.  Emits `PdbConnectivityWarning` if no bonds were found.
    """
    try:
        with open(filename) as fh:
            raw = fh.read().splitlines()
    except OSError:
        raise ParsePdbError(f"file '{filename}' was not found", code="FileNotFound") from None

    # atom number -> index mapping; duplicated atom numbers are an error
    number2index: dict[int, int] = {}
    for i in range(system.get_n_atoms()):
        num = int(system.topology.atomnum[i])
        if num in number2index:
            raise ParsePdbError(
                f"duplicate atom number {num} prevents reading connectivity",
                code="DuplicateAtomNumbers",
            )
        number2index[num] = i

    pairs = []
    for line in raw:
        if line.startswith("END") and not line.startswith("ENDMDL"):
            break
        if not line.startswith("CONECT"):
            continue
        if len(line) < 11:
            raise ParsePdbError(f"could not parse CONECT line '{line.rstrip()}'")
        fields = line[6:].split()
        try:
            numbers = [int(f) for f in fields]
        except ValueError:
            raise ParsePdbError(f"could not parse CONECT line '{line.rstrip()}'") from None
        if not numbers:
            raise ParsePdbError(f"could not parse CONECT line '{line.rstrip()}'")
        try:
            target = number2index[numbers[0]]
        except KeyError:
            raise ParsePdbError(
                f"CONECT references unknown atom number {numbers[0]}",
                code="InvalidAtomIndex",
            ) from None
        for num in numbers[1:]:
            try:
                bonded = number2index[num]
            except KeyError:
                raise ParsePdbError(
                    f"CONECT references unknown atom number {num}", code="InvalidAtomIndex"
                ) from None
            if bonded == target:
                raise ParsePdbError(
                    f"atom number {num} is bonded to itself", code="SelfBonding"
                )
            pairs.append((target, bonded))

    existing = [list(b) for b in system.topology.bonded]
    for i, j in pairs:
        if j not in existing[i]:
            existing[i].append(j)
            existing[j].append(i)
    system.topology.bonded = [sorted(set(b)) for b in existing]
    system.topology._invalidate_bonds()

    if not pairs:
        warnings.warn("no bonds found in PDB file", PdbConnectivityWarning, stacklevel=2)


# ---------------------------------------------------------------- writing

def format_pdb_atom_line(system, i: int) -> str:
    """reference: atom.rs write_pdb:633."""
    topo = system.topology
    resname = topo.resname.get(i)[:4]
    resname = f"{resname:>3} " if len(resname) <= 3 else f"{resname:>4}"
    atomname = topo.atomname.get(i)[:4]
    atomname = f" {atomname:<3}" if len(atomname) <= 3 else f"{atomname:<4}"
    chain = topo.chain.get(i) or " "
    pos = system.positions[i] if system.has_position[i] else np.zeros(3, np.float32)
    if ((pos < PDB_MIN_COORDINATE) | (pos > PDB_MAX_COORDINATE)).any():
        raise WritePdbError("coordinate too large for PDB format", code="CoordinateTooLarge")
    return (
        f"ATOM  {topo.atomnum[i] % 100000:>5} {atomname} {resname}{chain}"
        f"{topo.resnum[i] % 10000:>4}    "
        f"{pos[0] * 10.0:>8.3f}{pos[1] * 10.0:>8.3f}{pos[2] * 10.0:>8.3f}"
        f"  1.00  0.00            "
    )


def format_pdb_atom_blob(system, indices) -> bytes:
    """Vectorized ATOM lines -> one newline-joined byte blob (same
    characters as `format_pdb_atom_line`, composed as a byte matrix;
    coordinate fields go through the printf-exact integer formatter)."""
    from .gro import _fmt_fixed, _fmt_int

    topo = system.topology
    idx = np.asarray(indices)
    n = idx.shape[0]
    pos = np.where(system.has_position[idx, None], system.positions[idx],
                   np.float32(0.0))
    if ((pos < PDB_MIN_COORDINATE) | (pos > PDB_MAX_COORDINATE)).any():
        raise WritePdbError("coordinate too large for PDB format",
                            code="CoordinateTooLarge")

    def fixed(values, width):
        view = values.view(np.uint8).reshape(n, width)
        return np.where(view == 0, np.uint8(0x20), view)

    # resname: ">3 " when <= 3 chars else ">4"; atomname: " <3" or "<4"
    resname = topo.resname.values()[idx].astype("S4")
    rn_len = np.char.str_len(resname)
    rn_short = np.char.add(np.char.rjust(resname, 3), b" ").astype("S4")
    rn = np.where(rn_len <= 3, rn_short, np.char.rjust(resname, 4))
    atomname = topo.atomname.values()[idx].astype("S4")
    an_len = np.char.str_len(atomname)
    an_short = np.char.add(b" ", np.char.ljust(atomname, 3)).astype("S4")
    an = np.where(an_len <= 3, an_short, np.char.ljust(atomname, 4))
    chain = topo.chain.values()[idx].astype("S1")
    chain = np.where(np.char.str_len(chain) == 0, b" ", chain)

    mats = [
        np.broadcast_to(np.frombuffer(b"ATOM  ", np.uint8), (n, 6)),
        _fmt_int(topo.atomnum[idx] % 100000, 5),
        np.full((n, 1), 0x20, np.uint8),
        fixed(an, 4),
        np.full((n, 1), 0x20, np.uint8),
        fixed(rn, 4),
        fixed(chain, 1),
        _fmt_int(topo.resnum[idx] % 10000, 4),
        np.broadcast_to(np.frombuffer(b"    ", np.uint8), (n, 4)),
        _fmt_fixed(pos[:, 0].astype(np.float64) * 10.0, 8, 3),
        _fmt_fixed(pos[:, 1].astype(np.float64) * 10.0, 8, 3),
        _fmt_fixed(pos[:, 2].astype(np.float64) * 10.0, 8, 3),
        np.broadcast_to(
            np.frombuffer(b"  1.00  0.00            \n", np.uint8), (n, 25)),
    ]
    total = sum(m.shape[1] for m in mats)
    mat = np.empty((n, total), np.uint8)
    off = 0
    for m in mats:
        mat[:, off : off + m.shape[1]] = m
        off += m.shape[1]
    return mat.tobytes()


def write_pdb(system, filename, group: str = "all", write_conect: bool = False):
    """reference: pdb_io.rs write_pdb:236 / group_write_pdb."""
    if not system.group_exists(group):
        raise WritePdbError(f"group '{group}' does not exist", code="GroupNotFound")
    indices = system.group_indices(group)
    try:
        fh = open(filename, "w")
    except OSError:
        raise WritePdbError(f"could not create file '{filename}'", code="CouldNotCreate") from None
    with fh:
        title = (
            system.get_name()
            if group == "all"
            else f"Group `{group}` from {system.get_name()}"
        )
        fh.write(f"TITLE     {title}\n")
        sb = system.get_box()
        if sb is not None:
            lengths = sb.lengths()
            angles = sb.angles()
            fh.write("REMARK    THIS IS A SIMULATION BOX\n")
            fh.write(
                f"CRYST1{lengths[0] * 10:>9.3f}{lengths[1] * 10:>9.3f}{lengths[2] * 10:>9.3f}"
                f"{angles[0]:>7.2f}{angles[1]:>7.2f}{angles[2]:>7.2f} P 1           1\n"
            )
        fh.write("MODEL        1\n")
        fh.write(format_pdb_atom_blob(system, indices).decode())
        fh.write("TER\nENDMDL\n")
        if write_conect:
            _write_conect(system, fh, indices)
        fh.write("END\n")


def _write_conect(system, fh, indices):
    index_set = set(int(i) for i in indices)
    for i in indices:
        i = int(i)
        bonded = [j for j in system.topology.bonded[i] if j in index_set]
        if not bonded:
            continue
        # PDB spec: at most 4 bonded serials per CONECT record; longer
        # bond lists repeat the record (reference writer does the same)
        for k in range(0, len(bonded), 4):
            nums = "".join(
                f"{system.topology.atomnum[j] % 100000:>5}" for j in bonded[k : k + 4]
            )
            fh.write(f"CONECT{system.topology.atomnum[i] % 100000:>5}{nums}\n")
