"""groan_rs_tpu — a TPU-native molecular-dynamics trajectory analysis engine.

A from-scratch JAX/XLA framework with the capabilities of the groan_rs Rust
library (structure/trajectory I/O, the Groan Selection Language, PBC-aware
geometry, Bai-Breen centers, Kabsch RMSD, hydrogen bonds, grid maps,
frame-parallel map-reduce) — re-designed for TPU: trajectories become
batched `[frames, atoms, 3]` device arrays fed by a native C++ XTC/TRR
codec, selections compile to static masks/gather indices, and per-frame
analyses run as jitted, mesh-sharded steps.

The `prelude` mirrors the reference's `groan_rs::prelude` (lib.rs:377-426).
"""

from . import errors
from .core.dimension import Dimension
from .core.elements import Element, Elements
from .core.gridmap import GridMap
from .core.shapes import Cylinder, Rectangular, Shape, Sphere, TriangularPrism
from .core.simbox import SimBox
from .core.container import AtomContainer
from .files import FileType
from .progress import ProgressPrinter, ProgressStatus
from .system import Group, System
from .system.hbonds import HBond, HBondChain

__version__ = "0.1.0"

__all__ = [
    "System",
    "Group",
    "AtomContainer",
    "SimBox",
    "Dimension",
    "Shape",
    "Sphere",
    "Rectangular",
    "Cylinder",
    "TriangularPrism",
    "Elements",
    "Element",
    "GridMap",
    "HBond",
    "HBondChain",
    "FileType",
    "ProgressPrinter",
    "ProgressStatus",
    "errors",
    "__version__",
]


# convenience namespace matching the reference's prelude idiom
class prelude:
    System = System
    Group = Group
    AtomContainer = AtomContainer
    SimBox = SimBox
    Dimension = Dimension
    Sphere = Sphere
    Rectangular = Rectangular
    Cylinder = Cylinder
    TriangularPrism = TriangularPrism
    Elements = Elements
    GridMap = GridMap
    HBond = HBond
    HBondChain = HBondChain
    FileType = FileType
    ProgressPrinter = ProgressPrinter
    ProgressStatus = ProgressStatus
