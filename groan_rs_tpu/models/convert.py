"""Per-frame converter/analyzer framework
(reference: `src/structures/traj_convert.rs:19-161`).

- `FrameConvert.convert(system)` mutates the system's current frame
  (`FrameConvert`, traj_convert.rs:30).
- `FrameAnalyze.analyze(system) -> value` computes a per-frame observable
  (`FrameAnalyze`, traj_convert.rs:76).
- `convert_iter(reader, converters)` yields the converted system per frame
  (`TrajConverter`, traj_convert.rs:19).
- `analyze_iter(reader, analyzer, converters=())` yields (system, value)
  (`TrajAnalyzer` / `TrajConverterAnalyzer`, traj_convert.rs:65,114).

Anything implementing the duck-typed protocol works; plain functions are
accepted too (a function `f(system)` is a converter; one returning a value
is an analyzer).  For batched device-side analysis prefer
`models.TrajectoryAnalysis` — this framework is the API-parity per-frame
path (trajectory writers, custom mutations).
"""

from __future__ import annotations

__all__ = ["FrameConvert", "FrameAnalyze", "convert_iter", "analyze_iter",
           "TranslateConverter", "WrapConverter", "FitConverter"]


class FrameConvert:
    """Protocol: mutate the system's current frame in place."""

    def convert(self, system) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class FrameAnalyze:
    """Protocol: compute a per-frame observable."""

    def analyze(self, system):  # pragma: no cover - interface
        raise NotImplementedError


def _as_converter(c):
    if hasattr(c, "convert"):
        return c.convert
    return c


def convert_iter(reader, converters=()):
    """Apply converters to every frame of a reader, yielding the system."""
    fns = [_as_converter(c) for c in converters]
    for system in reader:
        for fn in fns:
            fn(system)
        yield system


def analyze_iter(reader, analyzer, converters=()):
    """Yield (system, analysis_value) per frame, after conversion."""
    an = analyzer.analyze if hasattr(analyzer, "analyze") else analyzer
    for system in convert_iter(reader, converters):
        yield system, an(system)


# ------------------------------------------------------------- converters

class TranslateConverter(FrameConvert):
    """Translate all atoms by a vector each frame (PBC wrap)."""

    def __init__(self, vector):
        self.vector = vector

    def convert(self, system) -> None:
        system.atoms_translate(self.vector)


class WrapConverter(FrameConvert):
    """Wrap all atoms into the box each frame."""

    def convert(self, system) -> None:
        system.atoms_wrap()


class FitConverter(FrameConvert):
    """RMSD-fit every frame onto a reference structure
    (reference: RMSDConverter semantics via calc_rmsd_and_fit)."""

    def __init__(self, reference, group: str):
        self.reference = reference
        self.group = group

    def convert(self, system) -> None:
        system.calc_rmsd_and_fit(self.reference, self.group)
