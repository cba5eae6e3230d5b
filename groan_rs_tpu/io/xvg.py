"""Grace (.xvg) output — the gmx analysis-tool output format.

Every CLI tool writes its curves through `write_xvg` so downstream
xmgrace / `gmx analyze` / numpy `loadtxt(comments=('#', '@'))`
workflows keep working unchanged.
"""

from __future__ import annotations

import numpy as np

__all__ = ["write_xvg", "read_xvg"]


def write_xvg(path, columns, *, title="", xlabel="", ylabel="",
              legends=(), comments=()):
    """Write columns ([X, C] or sequence of [X] arrays) as an .xvg file.

    The first column is the abscissa; `legends` label the remaining
    columns (s0, s1, ... lines, the gmx convention)."""
    cols = [np.asarray(c, np.float64) for c in
            (columns.T if isinstance(columns, np.ndarray) else columns)]
    n = len(cols[0])
    for c in cols:
        if len(c) != n:
            raise ValueError("xvg columns must share a length")
    with open(path, "w") as fh:
        for c in comments:
            fh.write(f"# {c}\n")
        fh.write(f'@    title "{title}"\n')
        fh.write(f'@    xaxis  label "{xlabel}"\n')
        fh.write(f'@    yaxis  label "{ylabel}"\n')
        fh.write("@TYPE xy\n")
        for i, leg in enumerate(legends):
            fh.write(f'@ s{i} legend "{leg}"\n')
        for row in zip(*cols):
            fh.write("  ".join(f"{v:14.8g}" for v in row) + "\n")


def read_xvg(path):
    """Read an .xvg back into a [N, C] float64 array (fixtures/tests)."""
    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line[0] in "#@":
                continue
            rows.append([float(v) for v in line.split()])
    return np.asarray(rows, np.float64)
