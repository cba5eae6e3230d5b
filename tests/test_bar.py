"""Bennett acceptance ratio free energies (`models.bar`, gmx bar) —
surpass feature absent from the reference.

Pinned by the Crooks-consistent Gaussian construction (closed-form
delta_f), exact symmetry identities, and an independent root check of
Bennett's equation.
"""

import numpy as np
import pytest

from groan_rs_tpu import models
from groan_rs_tpu.errors import ParallelError

KT300 = 0.00831446261815324 * 300.0


def _crooks_gaussian(rng, delta_f, sigma, nf, nr, kt=KT300):
    """Work samples satisfying the Crooks relation exactly in
    distribution: W_F ~ N(dF + beta sigma^2/2, sigma^2),
    W_R ~ N(-dF + beta sigma^2/2, sigma^2)."""
    beta = 1.0 / kt
    wf = rng.normal(delta_f + beta * sigma**2 / 2, sigma, nf)
    wr = rng.normal(-delta_f + beta * sigma**2 / 2, sigma, nr)
    return wf, wr


def test_bar_recovers_gaussian_delta_f():
    rng = np.random.default_rng(7)
    delta_f, sigma = 3.7, 2.0
    wf, wr = _crooks_gaussian(rng, delta_f, sigma, 40000, 40000)
    out = models.bar(wf, wr)
    assert out["converged"]
    assert out["delta_f"] == pytest.approx(delta_f, abs=4 * out["error"])
    assert out["delta_f"] == pytest.approx(delta_f, abs=0.1)
    assert 0 < out["error"] < 0.05


def test_bar_symmetric_zero_and_antisymmetry():
    wf = np.array([1.0, -1.0, 0.5, -0.5])
    wr = wf.copy()
    out = models.bar(wf, wr)
    assert out["delta_f"] == pytest.approx(0.0, abs=1e-10)

    rng = np.random.default_rng(11)
    a = rng.normal(2.0, 1.0, 500)
    b = rng.normal(-1.0, 1.5, 300)      # unequal sizes exercise the M term
    fwd = models.bar(a, b)["delta_f"]
    rev = models.bar(b, a)["delta_f"]
    assert fwd == pytest.approx(-rev, abs=1e-9)


def test_bar_solves_bennett_equation():
    # independent statement of Bennett's self-consistency at the root
    rng = np.random.default_rng(13)
    wf = rng.normal(1.0, 2.0, 800)
    wr = rng.normal(0.5, 1.0, 400)
    out = models.bar(wf, wr)
    x = out["delta_f"]
    beta = 1.0 / KT300
    m = KT300 * np.log(wf.size / wr.size)
    lhs = np.sum(1.0 / (1.0 + np.exp(np.clip(beta * (m + wf - x),
                                             -500, 500))))
    rhs = np.sum(1.0 / (1.0 + np.exp(np.clip(beta * (-m + wr + x),
                                             -500, 500))))
    assert lhs == pytest.approx(rhs, rel=1e-8)


def test_bar_temperature_scaling():
    # scaling work AND temperature by c scales delta_f by c
    rng = np.random.default_rng(17)
    wf, wr = _crooks_gaussian(rng, 2.0, 1.0, 5000, 5000)
    base = models.bar(wf, wr, temperature=300.0)["delta_f"]
    scaled = models.bar(2 * wf, 2 * wr, temperature=600.0)["delta_f"]
    assert scaled == pytest.approx(2 * base, rel=1e-9)


def test_bar_intervals_total_and_quadrature():
    rng = np.random.default_rng(19)
    iv = [_crooks_gaussian(rng, df, 1.0, 4000, 4000)
          for df in (1.0, -2.0, 0.5)]
    out = models.bar_intervals(iv)
    assert out["delta_f"].shape == (3,)
    assert out["total"] == pytest.approx(out["delta_f"].sum())
    assert out["total_error"] == pytest.approx(
        np.sqrt(np.sum(out["error"] ** 2)))
    assert out["total"] == pytest.approx(-0.5, abs=0.2)


def test_bar_errors():
    with pytest.raises(ParallelError):
        models.bar([], [1.0])
    with pytest.raises(ParallelError):
        models.bar([1.0], [1.0], temperature=-5)
    with pytest.raises(ParallelError):
        models.bar_intervals([])
