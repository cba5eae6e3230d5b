"""Analysis pipelines: composed per-frame analyses compiled to one step.

The "model" of this framework is the trajectory analysis pipeline: a set of
per-frame observables (centers, distances, RMSD, contacts) compiled into a
single jitted step over `[B, N, 3]` frame batches — the device-resident
replacement for the reference's per-frame `TrajAnalyzer` plug-ins
(`src/structures/traj_convert.rs:65`).
"""

from .convert import (
    CenterConverter,
    FitConverter,
    FrameAnalyze,
    FrameConvert,
    MakeWholeConverter,
    TranslateConverter,
    UnwrapConverter,
    WrapConverter,
    analyze_iter,
    convert_iter,
)
from .prep import genconf, genion, insert_molecules, solvate
from .pipeline import (
    TrajectoryAnalysis,
    bar,
    bar_intervals,
    bundle,
    chi,
    cluster,
    clustsize,
    current,
    dccm,
    densmap,
    dielectric,
    diffusion,
    dos,
    dssp,
    dyecoupl,
    entropy,
    filter_traj,
    freevolume,
    h2order,
    hbond_acf,
    helixorient,
    leaflets,
    mdmat,
    msd,
    order_parameters,
    pca,
    polystat,
    potential_profile,
    ramachandran,
    rmsd_matrix,
    rmsdist,
    rmsf,
    rotacf,
    rotmat,
    run_many,
    sans,
    sasa,
    saxs,
    sdf,
    sorient,
    tcaf,
    vacf,
    vanhove,
    wham,
    write_cube,
)

__all__ = ["TrajectoryAnalysis", "bar", "bar_intervals", "bundle", "chi",
           "cluster", "clustsize", "current", "dccm",
           "densmap",
           "dielectric",
           "diffusion",
           "dos", "dssp", "dyecoupl", "entropy", "filter_traj", "freevolume", "h2order", "hbond_acf", "helixorient",
           "leaflets", "mdmat", "msd",
           "order_parameters",
           "pca", "polystat", "potential_profile", "ramachandran",
           "rmsd_matrix", "rmsdist",
           "rmsf", "rotacf", "rotmat", "run_many",
           "genconf", "genion", "insert_molecules", "solvate",
           "sans", "sasa", "saxs", "sdf", "sorient", "tcaf", "vacf", "vanhove", "wham", "write_cube"]
