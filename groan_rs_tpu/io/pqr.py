"""PQR structure reading/writing.

reference: `src/io/pqr_io.rs` — whitespace-delimited ATOM lines with charge
and vdw-radius columns (`line_as_atom:223`; 11 fields with chain, 10
without; coords and radius in Angstrom -> nm), TITLE/CRYST1 shared with the
PDB parser, writers `write_pqr:138` / atom.rs:693 with configurable
`PqrPrecision:90`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..core.topology import Topology
from ..errors import ParsePqrError, WritePqrError
from .pdb import parse_cryst1


@dataclass
class PqrPrecision:
    """reference: pqr_io.rs:90"""

    position: int = 3
    charge: int = 4
    vdw: int = 4


def _parse_atom_line(line: str):
    split = line.split()
    if len(split) == 11:
        convert = 0
    elif len(split) == 10:
        convert = 1
    else:
        raise ParsePqrError(f"could not parse line '{line.rstrip()}' as atom")

    try:
        atomnum = int(split[1])
    except ValueError:
        raise ParsePqrError(f"could not parse line '{line.rstrip()}' as atom") from None
    atomname = split[2]
    resname = split[3]
    if convert == 0:
        if len(split[4]) != 1:
            raise ParsePqrError(f"could not parse line '{line.rstrip()}' as atom")
        chain = split[4]
    else:
        chain = ""
    try:
        resnum = int(split[5 - convert])
        vals = [float(split[k - convert]) for k in (6, 7, 8, 9, 10)]
    except ValueError:
        raise ParsePqrError(f"could not parse line '{line.rstrip()}' as atom") from None
    x, y, z = (v / 10.0 for v in vals[:3])
    if not all(math.isfinite(v) for v in (x, y, z)):
        raise ParsePqrError(f"position is not finite: '{line.rstrip()}'", code="InvalidFloat")
    charge = vals[3]
    vdw = vals[4] / 10.0
    if atomnum < 0 or resnum < 0:
        raise ParsePqrError(f"could not parse line '{line.rstrip()}' as atom")
    return resnum, resname, atomname, atomnum, chain, (x, y, z), charge, vdw


def read_pqr(filename):
    """reference: pqr_io.rs read_pqr:43."""
    from ..errors import ParsePdbError
    from ..system import System

    try:
        with open(filename) as fh:
            raw = fh.read().splitlines()
    except OSError:
        raise ParsePqrError(f"file '{filename}' was not found", code="FileNotFound") from None

    rows = []
    title = "Unknown"
    simbox = None
    for line in raw:
        if line.startswith("ATOM") or line.startswith("HETATM"):
            rows.append(_parse_atom_line(line))
        elif line.startswith("TITLE"):
            t = line[5:].strip()
            title = t if t else "Unknown"
        elif line.startswith("CRYST1"):
            try:
                simbox = parse_cryst1(line)
            except ParsePdbError as e:
                raise ParsePqrError(str(e)) from None
        elif line.startswith("END"):
            break

    n = len(rows)
    topo = Topology.from_columns(
        np.array([r[0] for r in rows], dtype=np.int64),
        np.array([r[1] for r in rows], dtype=object),
        np.array([r[2] for r in rows], dtype=object),
        np.array([r[3] for r in rows], dtype=np.int64),
        chain=np.array([r[4] for r in rows], dtype=object),
        charge=np.array([r[6] for r in rows], dtype=np.float32),
        vdw=np.array([r[7] for r in rows], dtype=np.float32),
    )
    pos = np.array([r[5] for r in rows], dtype=np.float32).reshape(n, 3)
    return System(name=title, topology=topo, simbox=simbox, positions=pos)


# ---------------------------------------------------------------- writing

def format_pqr_atom_line(system, i: int, precision: PqrPrecision) -> str:
    """reference: atom.rs write_pqr:693."""
    topo = system.topology
    resname = topo.resname.get(i)
    resname = f"{resname:>3} " if len(resname) <= 3 else f"{resname} "
    atomname = topo.atomname.get(i)
    atomname = f" {atomname:<3}" if len(atomname) <= 3 else atomname
    resid = int(topo.resnum[i])
    if resid <= 999:
        f_resid = f"{resid:>4}    "
    elif resid <= 9999:
        f_resid = f"{resid:>5}   "
    elif resid <= 99999:
        f_resid = f"{resid:>6}  "
    elif resid <= 999999:
        f_resid = f"{resid:>7} "
    elif resid <= 9999999:
        f_resid = f"{resid:>8}"
    else:
        f_resid = f" {resid}"
    atomnum = int(topo.atomnum[i])
    f_atomnum = f" {atomnum:>5}" if atomnum <= 99999 else f"{atomnum}"
    chain = topo.chain.get(i) or " "
    pos = system.positions[i] if system.has_position[i] else np.zeros(3, np.float32)
    charge = topo.charge[i] if topo.has_charge[i] else 0.0
    vdw = topo.vdw[i] if topo.has_vdw[i] else 0.0
    pp, pc, pv = precision.position, precision.charge, precision.vdw
    return (
        f"ATOM {f_atomnum} {atomname} {resname}{chain}{f_resid} "
        f"{pos[0] * 10.0:>7.{pp}f} {pos[1] * 10.0:>7.{pp}f} {pos[2] * 10.0:>7.{pp}f} "
        f"{charge:>7.{pc}f} {vdw * 10.0:>6.{pv}f}"
    )


def write_pqr(system, filename, precision: PqrPrecision | None = None, group: str = "all"):
    """reference: pqr_io.rs write_pqr:138 / group_write_pqr:186."""
    if not system.group_exists(group):
        raise WritePqrError(f"group '{group}' does not exist", code="GroupNotFound")
    precision = precision or PqrPrecision()
    indices = system.group_indices(group)
    try:
        fh = open(filename, "w")
    except OSError:
        raise WritePqrError(f"could not create file '{filename}'", code="CouldNotCreate") from None
    with fh:
        title = (
            system.get_name() if group == "all" else f"Group `{group}` from {system.get_name()}"
        )
        fh.write(f"TITLE     {title}\n")
        sb = system.get_box()
        if sb is not None:
            lengths = sb.lengths()
            angles = sb.angles()
            fh.write(
                f"CRYST1{lengths[0] * 10:>9.3f}{lengths[1] * 10:>9.3f}{lengths[2] * 10:>9.3f}"
                f"{angles[0]:>7.2f}{angles[1]:>7.2f}{angles[2]:>7.2f} P 1           1\n"
            )
        for i in indices:
            fh.write(format_pqr_atom_line(system, int(i), precision) + "\n")
