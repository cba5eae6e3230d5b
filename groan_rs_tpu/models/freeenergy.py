"""Free-energy and dielectric analyses (WHAM, BAR, LIE, static dielectric and spectrum).

Split out of models/pipeline.py (one module per analysis family); shared
loaders/helpers live in `models.pipeline`.  All public names remain
importable as `groan_rs_tpu.models.<name>` and `groan_rs_tpu.models.pipeline.<name>`.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.dimension import Dimension
from ..errors import GroupError, ParallelError, RMSDError
from ..ops import center as center_ops
from ..ops import distances as distance_ops
from ..ops import geometry
from ..ops import pbc
from ..ops import rmsd as rmsd_ops

from .pipeline import (  # shared core helpers
    TrajectoryAnalysis,
    _BOLTZ,
    _EPSILON0,
    _KB_KJ,
)

from .dynamics import dipole_corr


def dielectric(system, trajectory, group: str = "all", *,
               temperature: float = 300.0, batch_size: int = 32,
               triclinic: bool = False):
    """Static dielectric constant from total-dipole fluctuations (surpass
    — `gmx dipoles -epsilon`; absent from the reference).

    eps = 1 + (<M^2> - <M>^2) / (3 eps0 V kB T)   (Neumann, conducting
    boundary — the gmx dipoles formula), with M the per-frame total
    dipole of `group` (e*nm, `add_total_dipole` — per-molecule
    minimum-image origins, exact for whole neutral molecules) and V the
    per-frame box volume (`add_box_volume`).  Both observables evaluate
    on device in ONE batched pass; the O(F) fluctuation statistics run
    host-side in float64.

    Returns a dict: 'epsilon' (float), 'M' [F, 3] (e*nm), 'M_mean' [3],
    'fluct' (<M^2>-<M>^2, e^2 nm^2), 'volume' (mean nm^3),
    'n_charged_molecules' (molecules in `group` with |net charge| >
    1e-3 e — nonzero means M is origin-dependent, the same warning gmx
    dipoles prints).
    """
    pipe = (TrajectoryAnalysis(system, triclinic=triclinic)
            .add_total_dipole(group, name="M")
            .add_box_volume(name="vol"))
    out = pipe.runner(group=None, ship="all").run(
        trajectory, batch_size=batch_size)

    M = np.asarray(out["M"], np.float64)                  # [F, 3]
    vol = float(np.asarray(out["vol"], np.float64).mean())
    m_mean = M.mean(axis=0)
    fluct = float((M * M).sum(axis=1).mean() - (m_mean * m_mean).sum())
    eps = 1.0 + fluct / (3.0 * _EPSILON0 * vol * _BOLTZ * float(temperature))

    idx = np.asarray(system.group_indices(group))
    mol = system.topology.molecule_ids()[idx]
    qm = np.zeros(int(mol.max()) + 1 if mol.size else 0, np.float64)
    np.add.at(qm, mol, np.asarray(system.topology.charge[idx], np.float64))
    n_charged = int((np.abs(qm) > 1e-3).sum())

    return {"epsilon": eps, "M": M, "M_mean": m_mean, "fluct": fluct,
            "volume": vol, "n_charged_molecules": n_charged}

def wham(windows, *, bins: int = 200, span=None,
         temperature: float = 300.0, tol: float = 1e-10,
         max_iter: int = 100000):
    """1D WHAM over umbrella-sampling windows (surpass — the `gmx wham`
    workload; absent from the reference).

    `windows`: iterable of dicts with 'samples' (reaction-coordinate
    values, nm), 'center' (umbrella center x0, nm), and 'k' (harmonic
    force constant, kJ/mol/nm^2: bias = k/2 (x - x0)^2, the GROMACS
    pull-code convention).  Samples are histogrammed into `bins` shared
    bins over `span` (default: data min/max), then the standard
    self-consistent WHAM equations (Kumar et al. 1992) iterate in
    float64 to `tol` on the window free energies.  The [W, L] problem
    is tiny — this is deliberately exact host math, like the
    closed-form fits in `diffusion`/`current`.

    Returns a dict: 'x' [L] bin centers, 'pmf' [L] (kJ/mol,
    min-shifted; NaN where no window sampled), 'prob' [L] unbiased
    probability density, 'f' [W] window free energies (kJ/mol),
    'n_iter', 'converged'.
    """
    windows = list(windows)
    if not windows:
        raise ParallelError("wham needs at least one window")
    samples = [np.asarray(w["samples"], np.float64).ravel()
               for w in windows]
    centers = np.array([float(w["center"]) for w in windows])
    ks = np.array([float(w["k"]) for w in windows])
    if any(s.size == 0 for s in samples):
        raise ParallelError("wham windows must contain samples")
    if (ks <= 0).any():
        raise ParallelError("wham force constants must be positive")
    kt = _KB_KJ * float(temperature)

    lo, hi = (min(s.min() for s in samples),
              max(s.max() for s in samples)) if span is None else span
    lo, hi = float(lo), float(hi)
    if hi <= lo:
        raise ParallelError(f"invalid span ({lo}, {hi})")
    edges = np.linspace(lo, hi, bins + 1)
    x = 0.5 * (edges[:-1] + edges[1:])

    n_il = np.stack([np.histogram(s, bins=edges)[0].astype(np.float64)
                     for s in samples])              # [W, L]
    n_i = np.array([s.size for s in samples], np.float64)
    # bias Boltzmann factors per window/bin: the EXACT bin average
    # integral exp(-k/2 (x-x0)^2 / kT) dx / dx via erf, not the
    # bin-center value — the harmonic bias varies by several kT across
    # a bin at practical force constants, and the center-point rule
    # biases the PMF by O(k sigma dx) in every overlap region
    from math import erf, pi, sqrt
    dx_bin = edges[1] - edges[0]
    a = 0.5 * ks / kt                                # [W]
    c_il = np.empty((len(windows), bins))
    for i in range(len(windows)):
        sa = sqrt(a[i])
        e = np.array([erf(sa * (ed - centers[i])) for ed in edges])
        c_il[i] = (e[1:] - e[:-1]) * (sqrt(pi / a[i]) / (2.0 * dx_bin))

    num = n_il.sum(axis=0)                           # [L]
    f = np.ones(len(windows))                        # exp(f_i / kT) terms
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        denom = (n_i * f) @ c_il                     # [L]
        with np.errstate(invalid="ignore", divide="ignore"):
            p = np.where(denom > 0, num / denom, 0.0)
        f_new = 1.0 / np.maximum(c_il @ p, 1e-300)
        f_new /= f_new[0]
        if np.abs(np.log(f_new) - np.log(f)).max() < tol:
            f = f_new
            converged = True
            break
        f = f_new

    denom = (n_i * f) @ c_il
    with np.errstate(invalid="ignore", divide="ignore"):
        p = np.where(denom > 0, num / denom, np.nan)
    # normalize to a probability density over the sampled bins
    dx = (hi - lo) / bins
    norm = np.nansum(p) * dx
    p = p / norm if norm > 0 else p
    with np.errstate(invalid="ignore", divide="ignore"):
        pmf = -kt * np.log(p)
    pmf -= np.nanmin(pmf)
    # exp(-f_i/kT) = sum_l c_il P_l and we iterate on exp(+f_i/kT)
    return {"x": x, "pmf": pmf, "prob": p,
            "f": kt * np.log(f), "n_iter": it, "converged": converged}

def bar(w_forward, w_reverse, *, temperature: float = 300.0,
        tol: float = 1e-12, max_iter: int = 200):
    """Bennett acceptance ratio free-energy difference (surpass — the
    `gmx bar` estimator; absent from the reference).

    `w_forward`: work samples W_F = U_B − U_A evaluated on configurations
    sampled from state A; `w_reverse`: W_R = U_A − U_B on configurations
    from state B (both kJ/mol).  Solves Bennett's self-consistent
    equation (Bennett 1976; the gmx bar / pymbar estimator) in float64
    by Newton iteration with a bisection fallback — the objective

        g(x) = Σ_F fermi(β(M + W_F − x)) − Σ_R fermi(β(−M + W_R + x)),
        M = kT ln(n_F / n_R),  fermi(u) = 1/(1 + e^u)

    is strictly increasing in x, so the root ΔF is unique.  The error
    estimate is Bennett's asymptotic variance.

    Returns a dict: 'delta_f' (kJ/mol), 'error' (kJ/mol, asymptotic
    std. err.), 'n_iter', 'converged'.
    """
    wf = np.asarray(w_forward, np.float64).ravel()
    wr = np.asarray(w_reverse, np.float64).ravel()
    if wf.size == 0 or wr.size == 0:
        raise ParallelError("bar needs samples in both directions")
    if temperature <= 0:
        raise ParallelError(f"temperature must be positive, got "
                            f"{temperature}")
    kt = _KB_KJ * float(temperature)
    beta = 1.0 / kt
    m = kt * np.log(wf.size / wr.size)

    def fermi(u):
        # overflow-safe 1/(1+e^u)
        out = np.empty_like(u)
        pos = u > 0
        out[pos] = np.exp(-u[pos]) / (1.0 + np.exp(-u[pos]))
        out[~pos] = 1.0 / (1.0 + np.exp(u[~pos]))
        return out

    def g(x):
        return (fermi(beta * (m + wf - x)).sum()
                - fermi(beta * (-m + wr + x)).sum())

    # bracket the root: g is increasing in x
    lo = min(wf.min(), -wr.max()) - abs(m) - 10.0 * kt
    hi = max(wf.max(), -wr.min()) + abs(m) + 10.0 * kt
    x = 0.5 * (lo + hi)
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        gx = g(x)
        if gx < 0:
            lo = x
        else:
            hi = x
        # Newton step from the analytic derivative
        ff = fermi(beta * (m + wf - x))
        fr = fermi(beta * (-m + wr + x))
        dg = beta * (np.sum(ff * (1.0 - ff)) + np.sum(fr * (1.0 - fr)))
        if dg != 0.0:
            xn = x - gx / dg
            if not (lo < xn < hi):
                xn = 0.5 * (lo + hi)
        else:
            xn = 0.5 * (lo + hi)
        if abs(xn - x) <= tol * max(1.0, abs(x)):
            x = xn
            converged = True
            break
        x = xn

    # Bennett's asymptotic variance (Bennett 1976 eq. 10)
    ff = fermi(beta * (m + wf - x))
    fr = fermi(beta * (-m + wr + x))
    nf, nr = wf.size, wr.size
    mean_sq = (np.sum(ff * ff) + np.sum(fr * fr)) / (nf + nr)
    mean = (ff.sum() + fr.sum()) / (nf + nr)
    denom = mean * mean
    if denom > 0:
        var = (mean_sq / denom - 1.0) * (1.0 / nf + 1.0 / nr) * kt * kt
        err = float(np.sqrt(max(var, 0.0)))
    else:
        err = float("nan")
    return {"delta_f": float(x), "error": err, "n_iter": it,
            "converged": bool(converged)}

def bar_intervals(intervals, *, temperature: float = 300.0):
    """Chain `bar` over adjacent lambda intervals (the multi-interval
    `gmx bar` output): `intervals` is an iterable of (w_forward,
    w_reverse) pairs.  Returns a dict with per-interval 'delta_f'/
    'error' arrays and the 'total' / 'total_error' (errors add in
    quadrature, like gmx bar)."""
    dfs, errs = [], []
    for wf, wr in intervals:
        out = bar(wf, wr, temperature=temperature)
        dfs.append(out["delta_f"])
        errs.append(out["error"])
    if not dfs:
        raise ParallelError("bar_intervals needs at least one interval")
    dfs = np.asarray(dfs)
    errs = np.asarray(errs)
    return {"delta_f": dfs, "error": errs, "total": float(dfs.sum()),
            "total_error": float(np.sqrt(np.sum(errs * errs)))}

def _debye_eps(phi, t, omega, eps_static):
    """eps(w) = 1 + (eps_s - 1) * (1 - i w FL[phi](w)) with FL the
    one-sided Fourier-Laplace transform by float64 trapezoid — the
    linear-response bridge from the normalized total-dipole ACF to the
    complex dielectric spectrum (exactly the Debye form for a
    single-exponential phi in the well-sampled limit)."""
    ph = np.exp(-1j * np.asarray(omega)[:, None] * np.asarray(t)[None, :])
    fl = np.trapezoid(ph * np.asarray(phi)[None, :], t, axis=1)
    return 1.0 + (eps_static - 1.0) * (1.0 - 1j * np.asarray(omega) * fl)

def dielectric_spectrum(system, trajectory, group: str = "all", *,
                        temperature: float = 300.0, omega=None,
                        n_freq: int = 120, batch_size: int = 32):
    """Frequency-dependent dielectric constant from the total-dipole
    ACF (surpass — the `gmx dielectric` workload; absent from the
    reference).

    With phi(t) the normalized total-dipole ACF (uniform frame grid
    required) and eps_s the static Neumann fluctuation value
    (`models.dielectric`):
        eps(w) = 1 + (eps_s - 1) * (1 - i w FL[phi](w)),
    where FL is the one-sided Fourier-Laplace transform evaluated by a
    float64 trapezoid over the sampled curve — so a single-exponential
    phi reproduces the Debye form (eps_s - 1)/(1 + i w tau) exactly in
    the well-sampled limit.

    Returns a dict: 'omega' [W] rad/ps, 'eps_real'/'eps_imag' [W]
    (eps_imag >= 0 is the loss), 'eps_static', 'phi' [L],
    'lag_times' [L] ps, 'corr_time' ps.
    """
    st = dielectric(system, trajectory, group,
                    temperature=temperature, batch_size=batch_size)
    ac = dipole_corr(system, trajectory, group, mode="total",
                     batch_size=batch_size)
    t = ac["lag_times"]
    if len(t) < 3:
        raise ParallelError("dielectric_spectrum needs >= 3 frames")
    dts = np.diff(t)
    if not np.allclose(dts, dts[0], rtol=1e-4, atol=1e-9):
        raise ParallelError(
            "dielectric_spectrum requires a uniform frame time grid "
            f"(dt spans {dts.min():.6g}..{dts.max():.6g} ps)")
    phi = ac["phi"]
    if omega is None:
        t_tot = float(t[-1])
        omega = np.geomspace(2.0 * np.pi / t_tot,
                             np.pi / float(dts[0]), int(n_freq))
    omega = np.asarray(omega, np.float64)
    eps = _debye_eps(phi, t, omega, st["epsilon"])
    return {"omega": omega, "eps_real": eps.real, "eps_imag": -eps.imag,
            "eps_static": st["epsilon"], "phi": phi, "lag_times": t,
            "corr_time": ac["corr_time"]}

def lie(e_lj, e_qq, *, clj: float = 0.181, cqq: float = 0.5,
        elj0: float = 0.0, eqq0: float = 0.0):
    """Linear interaction energy binding estimate (surpass — the
    `gmx lie` workload; absent from the reference).

    dG(t) = clj * (E_lj(t) - elj0) + cqq * (E_qq(t) - eqq0) over
    per-frame ligand-environment LJ / Coulomb interaction energies
    (kJ/mol; gmx lie reads them from an energy file, here any array —
    e.g. `io.xvg.read_xvg` columns).  Defaults are gmx lie's
    (Aqvist's alpha = 0.181, beta = 0.5).

    Returns a dict: 'dg' [F], 'dg_mean', 'dg_std' (of the mean, block
    size 1), 'e_lj_mean', 'e_qq_mean'.
    """
    e_lj = np.asarray(e_lj, np.float64)
    e_qq = np.asarray(e_qq, np.float64)
    if e_lj.shape != e_qq.shape or e_lj.ndim != 1 or e_lj.size == 0:
        raise ParallelError(
            "e_lj and e_qq must be equal-length non-empty 1D series")
    dg = clj * (e_lj - elj0) + cqq * (e_qq - eqq0)
    return {"dg": dg, "dg_mean": float(dg.mean()),
            "dg_std": float(dg.std(ddof=1) / np.sqrt(dg.size))
            if dg.size > 1 else 0.0,
            "e_lj_mean": float(e_lj.mean()),
            "e_qq_mean": float(e_qq.mean())}
