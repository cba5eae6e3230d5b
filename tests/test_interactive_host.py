"""Interactive host fast path (`ops/interactive.py`): per-call System
analysis runs the same jnp kernels jit-cached on the local CPU backend with
pow2 padding.  These tests pin (a) numeric equality vs the eager unpadded
ops, (b) edge semantics (empty / single-atom selections), and (c) the env
fallback.  Reference ergonomics being matched: `src/system/analysis.rs:105`
(per-call methods are cheap CPU math there)."""

import os

import numpy as np
import pytest

from groan_rs_tpu.ops import center as center_ops
from groan_rs_tpu.ops import distances as distance_ops
from groan_rs_tpu.ops import interactive, pbc

RNG = np.random.default_rng(7)


def _pts(n):
    return (RNG.random((n, 3)) * 9.0).astype(np.float32)


BOX = np.array([9.0, 9.0, 9.0], np.float32)


def test_host_enabled_on_cpu_suite():
    assert interactive.host_enabled()


@pytest.mark.parametrize("n", [1, 2, 3, 17, 64, 1000])
def test_center_matches_eager_unpadded(n):
    pos = _pts(n)
    got = interactive.center(pos, BOX)
    ref = np.asarray(center_ops.center(pos, BOX))
    # 1-ulp tolerance: jit fuses (FMA) where the eager op does not
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("n", [3, 17, 100])
def test_weighted_paths_match(n):
    pos, w = _pts(n), (RNG.random(n).astype(np.float32) + 0.5)
    for fast, ref in [
        (interactive.center(pos, BOX, weights=w),
         center_ops.center(pos, BOX, weights=w)),
        (interactive.estimate_center(pos, BOX, weights=w),
         center_ops.estimate_center(pos, BOX, weights=w)),
        (interactive.center_naive(pos, weights=w),
         center_ops.center_naive(pos, weights=w)),
    ]:
        np.testing.assert_allclose(fast, np.asarray(ref), atol=1e-6)


def test_empty_selection_is_nan():
    out = interactive.estimate_center(np.zeros((0, 3), np.float32), BOX)
    assert np.isnan(out).all()


def test_triclinic_matches():
    h = np.array([[9, 0, 0], [1.5, 8, 0], [-1, 2, 7]], np.float32)
    pos, w = _pts(33), RNG.random(33).astype(np.float32)
    np.testing.assert_allclose(
        interactive.center_triclinic(pos, h, weights=w),
        np.asarray(center_ops.center_triclinic(pos, h, weights=w)),
        atol=1e-5)


def test_distance_and_matrix_match():
    a, b = _pts(13), _pts(21)
    got = interactive.distance_matrix(a, b, BOX)
    ref = np.asarray(distance_ops.distance_matrix(a, b, BOX))
    assert got.shape == (13, 21)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # oriented 1-D variant (reference semantics for single active axis)
    dm = (False, True, False)
    np.testing.assert_allclose(
        interactive.distance_matrix(a, b, BOX, dm),
        np.asarray(distance_ops.distance_matrix(a, b, BOX, dm)), atol=1e-5)
    np.testing.assert_allclose(
        interactive.distance(a[0], b[0], BOX, dm),
        np.asarray(pbc.distance(a[0], b[0], BOX, dm)), atol=1e-5)


def test_env_fallback_to_default_device(monkeypatch):
    monkeypatch.setenv("GROAN_INTERACTIVE_DEVICE", "default")
    assert not interactive.host_enabled()
    pos = _pts(10)
    np.testing.assert_allclose(
        interactive.center(pos, BOX),
        np.asarray(center_ops.center(pos, BOX)), atol=1e-5)


def test_system_methods_use_host_path():
    from groan_rs_tpu.system import System

    s = System.from_file("/root/reference/test_files/example.tpr")
    s.group_create("P", "@protein")
    pos = s._group_positions("P")
    box = s._check_box()
    np.testing.assert_allclose(
        s.group_get_center("P"), np.asarray(center_ops.center(pos, box)),
        atol=1e-5)
    m = s._group_masses("P")
    np.testing.assert_allclose(
        s.group_get_com("P"),
        np.asarray(center_ops.center(pos, box, weights=m)), atol=1e-5)
