"""Pallas TPU kernels for the atom-axis hot ops (SURVEY §7: "Pallas where
fusion wins" — tiled PBC pair kernels that never materialize N x M).

`min_distance` / `contact_count` over two atom sets tile the pair grid
like blockwise attention: each (TN, TM) tile loads two coordinate slabs
into VMEM, computes minimum-image squared distances on the VPU, reduces
in-register, and writes one scalar per tile; the [N, M] matrix never
exists in HBM (SURVEY §5 long-context analogue).

On CPU (tests, virtual meshes) the kernels run through the Pallas
interpreter — same code path, bit-compatible semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_N = 256
TILE_M = 256
_BIG = 1e30  # python float: jnp constants would be captured by the kernel


def _pair_tile_kernel(n_ref, m_ref, cutoff_ref, a_ref, b_ref, box_ref,
                      min_ref, cnt_ref):
    """One (TN, TM) tile: min-image squared distances + reductions.

    a_ref: [TN, 3]; b_ref: [TM, 3]; box_ref: [1, 3] (SMEM);
    n_ref/m_ref/cutoff_ref: scalars (SMEM).  Outputs: per-tile min
    distance^2 and contact count (distance^2 < cutoff^2), padding-masked.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    d2 = jnp.zeros((TILE_N, TILE_M), jnp.float32)
    for ax in range(3):
        aa = a_ref[:, ax].reshape(TILE_N, 1)
        bb = b_ref[:, ax].reshape(1, TILE_M)
        box_l = box_ref[0, ax]
        d = aa - bb
        # minimum image: d - L * floor(d / L + 0.5)
        d = d - box_l * jnp.floor(d / box_l + 0.5)
        d2 = d2 + d * d

    # mask padded rows/cols
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, TILE_M), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_N, TILE_M), 1)
    valid = (rows + i * TILE_N < n_ref[0]) & (cols + j * TILE_M < m_ref[0])

    # accumulate across the sequential TPU grid into (8, 128) VMEM blocks
    # (scalar broadcast keeps the layout aligned; element [0, 0] carries
    # the global reduction)
    @pl.when((i == 0) & (j == 0))
    def _init():
        min_ref[:] = jnp.full((8, 128), _BIG, jnp.float32)
        cnt_ref[:] = jnp.zeros((8, 128), jnp.int32)

    d2_min = jnp.where(valid, d2, _BIG)
    min_ref[:] = jnp.minimum(min_ref[:], jnp.min(d2_min))

    cut2 = cutoff_ref[0] * cutoff_ref[0]
    tile_cnt = jnp.sum(
        jnp.where(valid & (d2 < cut2), jnp.int32(1), jnp.int32(0))
    )
    cnt_ref[:] = cnt_ref[:] + tile_cnt


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pair_reduce(a, b, box, cutoff, *, interpret):
    n, m = a.shape[0], b.shape[0]
    n_pad = -(-n // TILE_N) * TILE_N
    m_pad = -(-m // TILE_M) * TILE_M
    a_p = jnp.pad(a.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    b_p = jnp.pad(b.astype(jnp.float32), ((0, m_pad - m), (0, 0)))
    grid = (n_pad // TILE_N, m_pad // TILE_M)

    from jax.experimental.pallas import tpu as pltpu

    mins, cnts = pl.pallas_call(
        _pair_tile_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n
            pl.BlockSpec(memory_space=pltpu.SMEM),  # m
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cutoff
            pl.BlockSpec((TILE_N, 3), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE_M, 3), lambda i, j: (j, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # box [1, 3]
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.asarray([n], jnp.int32),
        jnp.asarray([m], jnp.int32),
        jnp.asarray([cutoff], jnp.float32),
        a_p,
        b_p,
        jnp.asarray(box, jnp.float32).reshape(1, 3),
        )
    return jnp.sqrt(mins[0, 0]), cnts[0, 0]


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def min_distance(a, b, box):
    """Minimum PBC distance between two atom sets `[N, 3]`, `[M, 3]`
    (orthogonal `box` `(3,)`) without materializing N x M."""
    d, _ = _pair_reduce(a, b, box, 0.0, interpret=_use_interpret())
    return d


def contact_count(a, b, box, cutoff: float):
    """Number of pairs with PBC distance < cutoff, tiled."""
    _, c = _pair_reduce(a, b, box, float(cutoff), interpret=_use_interpret())
    return c


def _vmapped(fn, ndim):
    for _ in range(ndim - 2):
        fn = jax.vmap(fn)
    return fn


def min_distance_batched(a, b, box):
    """`min_distance` over leading batch dims: a [..., N, 3], b [..., M, 3],
    box [..., 3] -> [...] (vmap adds grid dimensions to the tiled kernel)."""
    a = jnp.asarray(a)
    if a.ndim == 2:
        return min_distance(a, b, box)
    return _vmapped(lambda aa, bb, bx: min_distance(aa, bb, bx), a.ndim)(
        a, jnp.asarray(b), jnp.asarray(box))


def contact_count_batched(a, b, box, cutoff: float):
    """`contact_count` over leading batch dims (see min_distance_batched)."""
    a = jnp.asarray(a)
    if a.ndim == 2:
        return contact_count(a, b, box, cutoff)
    return _vmapped(lambda aa, bb, bx: contact_count(aa, bb, bx, cutoff), a.ndim)(
        a, jnp.asarray(b), jnp.asarray(box))


# ======================================================================
# Fused Bai-Breen refined center (SURVEY §7: "Bai-Breen trig reduce")
# ======================================================================

def _center_tile_kernel(n_ref, a_ref, w_ref, box_ref, trig_ref):
    """Accumulate per-tile Bai-Breen partial sums for one frame.

    Grid: (n_tiles,) over the atom axis.  a_ref: [TN, 3] coords;
    w_ref: [TN, 1] weights (0 = masked/padded); box_ref: [1, 3] SMEM.
    trig_ref accumulates [8, 128] lanes where lanes 0..5 of row 0 carry
    (xi_x, xi_y, xi_z, zeta_x, zeta_y, zeta_z) and lane 6 the weight sum.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        trig_ref[:] = jnp.zeros((8, 128), jnp.float32)

    two_pi = 6.283185307179586
    w = w_ref[:, 0:1]  # [TN, 1]: Mosaic wants 2-D refs (no 1-D offsets)
    acc = jnp.zeros((8, 128), jnp.float32)
    for ax in range(3):
        box_l = box_ref[0, ax]
        x = a_ref[:, ax:ax + 1]  # [TN, 1]
        # wrap into the box, then angle
        xw = x - box_l * jnp.floor(x / box_l)
        theta = xw * (two_pi / box_l)
        xi = jnp.sum(w * jnp.cos(theta))
        zeta = jnp.sum(w * jnp.sin(theta))
        onehot_xi = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == ax) & (
            jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0
        )
        onehot_zeta = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 3 + ax) & (
            jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0
        )
        acc = acc + jnp.where(onehot_xi, xi, 0.0) + jnp.where(onehot_zeta, zeta, 0.0)
    onehot_w = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 6) & (
        jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0
    )
    acc = acc + jnp.where(onehot_w, jnp.sum(w), 0.0)
    trig_ref[:] = trig_ref[:] + acc


TILE_C = 512


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bai_breen_estimate(positions, weights, box, *, interpret):
    """Pallas pass 1: masked circular-mean estimate of one frame.

    positions [N, 3], weights [N] (0 = excluded), box (3,) -> est [3]."""
    from jax.experimental.pallas import tpu as pltpu

    n = positions.shape[0]
    n_pad = -(-n // TILE_C) * TILE_C
    a = jnp.pad(positions.astype(jnp.float32), ((0, n_pad - n), (0, 0)),
                constant_values=1.0)  # padded coords are masked by w=0
    w = jnp.pad(weights.astype(jnp.float32), (0, n_pad - n))[:, None]
    grid = (n_pad // TILE_C,)

    trig = pl.pallas_call(
        _center_tile_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n (unused placeholder)
            pl.BlockSpec((TILE_C, 3), lambda i: (i, 0)),
            pl.BlockSpec((TILE_C, 1), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # box [1, 3]
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray([n], jnp.int32),
        a,
        w,
        jnp.asarray(box, jnp.float32).reshape(1, 3),
    )
    xi = trig[0, 0:3]
    zeta = trig[0, 3:6]
    box_v = jnp.asarray(box, jnp.float32)
    theta_c = jnp.arctan2(-zeta, -xi) + jnp.pi
    return theta_c * (box_v / jnp.float32(6.283185307179586))


def bai_breen_estimate(positions, weights, box):
    """Pallas-fused Bai-Breen circular-mean center estimate for one frame
    (`estimate_center` semantics; the wrap + trig + masked reduce is a
    single VMEM-resident pass over the atom axis)."""
    return _bai_breen_estimate(
        jnp.asarray(positions), jnp.asarray(weights), box,
        interpret=_use_interpret(),
    )


def _refine_tile_kernel(a_ref, w_ref, box_ref, est_ref, out_ref):
    """Pass 2: unwrap each atom around the estimate and accumulate the
    weighted mean numerator (lanes 0..2) and denominator (lane 3)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros((8, 128), jnp.float32)

    w = w_ref[:, 0:1]
    acc = jnp.zeros((8, 128), jnp.float32)
    for ax in range(3):
        box_l = box_ref[0, ax]
        est = est_ref[0, ax]
        x = a_ref[:, ax:ax + 1]
        half = box_l * 0.5
        d = x - est + half
        unwrapped = est + (d - box_l * jnp.floor(d / box_l) - half)
        num = jnp.sum(w * unwrapped)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == ax) & (
            jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0
        )
        acc = acc + jnp.where(onehot, num, 0.0)
    onehot_den = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 3) & (
        jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0
    )
    acc = acc + jnp.where(onehot_den, jnp.sum(w), 0.0)
    out_ref[:] = out_ref[:] + acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bai_breen_center(positions, weights, box, *, interpret):
    from jax.experimental.pallas import tpu as pltpu

    est = _bai_breen_estimate(positions, jnp.ones(positions.shape[0],
                                                  jnp.float32) * (weights > 0),
                              box, interpret=interpret)
    n = positions.shape[0]
    n_pad = -(-n // TILE_C) * TILE_C
    a = jnp.pad(positions.astype(jnp.float32), ((0, n_pad - n), (0, 0)),
                constant_values=1.0)
    w = jnp.pad(weights.astype(jnp.float32), (0, n_pad - n))[:, None]
    grid = (n_pad // TILE_C,)

    out = pl.pallas_call(
        _refine_tile_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_C, 3), lambda i: (i, 0)),
            pl.BlockSpec((TILE_C, 1), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # box [1, 3]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # est [1, 3]
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(
        a,
        w,
        jnp.asarray(box, jnp.float32).reshape(1, 3),
        est.reshape(1, 3),
    )
    return out[0, 0:3] / out[0, 3]


def bai_breen_center(positions, weights, box):
    """Pallas-fused REFINED Bai-Breen center for one frame: the geometric
    circular-mean estimate pass plus the unwrap-and-weighted-mean
    refinement pass (`ops.center.center` semantics; iterators.rs:1237-1266)
    — two VMEM-resident passes over the atom axis."""
    return _bai_breen_center(
        jnp.asarray(positions), jnp.asarray(weights), box,
        interpret=_use_interpret(),
    )
