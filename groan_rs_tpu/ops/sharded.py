"""Multi-device sharded analysis step (frames x atoms mesh).

The full "training step" of this framework: one jitted `shard_map` over a
`(frames, atoms)` `jax.sharding.Mesh` that evaluates the per-frame
analysis suite (Bai-Breen COM, group-center distance, mass-weighted Kabsch
RMSD) with

- the batch (frame) axis sharded over `frames`   — data parallelism, the
  TPU-native form of the reference's thread map-reduce (parallel.rs:208)
- the atom axis sharded over `atoms`             — the "sequence-parallel"
  analogue (SURVEY §2.3): per-atom partial sums (trig sums, covariances,
  weighted means) are computed locally and combined with `psum` over the
  `atoms` axis riding ICI; only 3-vectors and 3x3 matrices cross chips.

All collectives are XLA collectives inserted by shard_map; nothing is
hand-scheduled.
"""

from __future__ import annotations

from functools import partial

import numpy as np

_TWO_PI = 6.283185307179586


def _masked_bai_breen_center(pos, box, w):
    """Local partial Bai-Breen + psum over 'atoms' -> refined center.

    pos: [b, n_local, 3]; box: [b, 3]; w: [n_local] weights (0 = excluded).
    Returns ([b, 3] center, [b] total weight).
    """
    import jax
    import jax.numpy as jnp

    from .pbc import vector_to, wrap

    scale = _TWO_PI / box  # [b, 3]
    theta = wrap(pos, box[:, None, :]) * scale[:, None, :]
    wx = w[None, :, None]
    xi = jax.lax.psum(jnp.sum(wx * jnp.cos(theta), axis=1), "atoms")
    zeta = jax.lax.psum(jnp.sum(wx * jnp.sin(theta), axis=1), "atoms")
    est = (jnp.arctan2(-zeta, -xi) + jnp.pi) / scale  # [b, 3]

    unwrapped = est[:, None, :] + vector_to(est[:, None, :], pos, box[:, None, :])
    num = jax.lax.psum(jnp.sum(wx * unwrapped, axis=1), "atoms")
    den = jax.lax.psum(jnp.sum(w), "atoms")
    return num / den, den


def _sharded_step(pos, box, frame_mask, mask_a, mask_b, masses, ref_local,
                  ref_center, ref_wsum):
    """Body run per device shard (under shard_map).

    pos [b, n_local, 3] float32 OR int16 (the q16 wire format: raw
    quantized XTC ints, dequantized in-shard with the decoder's own
    multiply — the full host->device input pipeline under shard_map);
    box [b, 3]; frame_mask [b]; mask_a / mask_b [n_local] group masks;
    masses [n_local]; ref_local [n_local, 3] reference coords (already
    centered at the reference box center and masked); ref_center [3];
    ref_wsum [] total reference mass (precomputed host-side).
    """
    import jax
    import jax.numpy as jnp

    if pos.dtype == jnp.int16:
        pos = pos.astype(jnp.float32) * jnp.float32(1.0 / 1000.0)

    from .pbc import min_image, wrap
    from .rmsd import _quaternion_to_matrix

    wa = mask_a.astype(pos.dtype)
    wb = mask_b.astype(pos.dtype)
    wm = wa * masses

    # group centers (refined Bai-Breen, atom-sharded)
    com_a, _ = _masked_bai_breen_center(pos, box, wm)
    cog_b, _ = _masked_bai_breen_center(pos, box, wb)

    # PBC distance between the two group centers
    d = min_image(com_a - cog_b, box)
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))

    # mass-weighted Kabsch RMSD of group A vs the reference
    box_center = box * 0.5
    shifted = wrap(pos + (box_center - com_a)[:, None, :], box[:, None, :])
    qc = (shifted - box_center[:, None, :]) * wa[None, :, None]  # masked, centered
    pc = ref_local[None, :, :] - 0.0  # already centered & masked

    h_local = jnp.einsum("bni,bnj->bij", jnp.broadcast_to(pc, qc.shape), qc,
                         precision=jax.lax.Precision.HIGHEST)
    h = jax.lax.psum(h_local, "atoms")

    sxx, sxy, sxz = h[:, 0, 0], h[:, 0, 1], h[:, 0, 2]
    syx, syy, syz = h[:, 1, 0], h[:, 1, 1], h[:, 1, 2]
    szx, szy, szz = h[:, 2, 0], h[:, 2, 1], h[:, 2, 2]
    k0 = jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx], axis=-1)
    k1 = jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], axis=-1)
    k2 = jnp.stack([szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy], axis=-1)
    k3 = jnp.stack([sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz], axis=-1)
    kmat = jnp.stack([k0, k1, k2, k3], axis=-2)
    _, vecs = jnp.linalg.eigh(kmat)
    rot = _quaternion_to_matrix(vecs[..., :, -1])
    r = jnp.swapaxes(rot, -1, -2)

    p_rot = jnp.einsum("bni,bij->bnj", jnp.broadcast_to(pc, qc.shape), r,
                       precision=jax.lax.Precision.HIGHEST)
    dd = p_rot - qc
    local = jnp.sum(wm[None, :] * jnp.sum(dd * dd, axis=-1), axis=1)
    ssq = jax.lax.psum(local, "atoms")
    rmsd = jnp.sqrt(ssq / ref_wsum)

    # a trajectory-level reduction: mean COM over valid frames (psum over
    # the frames axis — the reference's ParallelTrajData::reduce analogue)
    fm = frame_mask.astype(pos.dtype)
    com_sum = jax.lax.psum(jnp.sum(com_a * fm[:, None], axis=0), "frames")
    n_frames = jax.lax.psum(jnp.sum(fm), "frames")
    mean_com = com_sum / n_frames

    return {"com": com_a, "distance": dist, "rmsd": rmsd, "mean_com": mean_com}


def build_sharded_step(mesh):
    """Compile the full sharded analysis step over `mesh` (frames x atoms)."""
    import jax
    from jax.sharding import PartitionSpec as P

    try:
        from jax.experimental.shard_map import shard_map
    except ImportError:  # newer jax
        from jax import shard_map

    smapped = shard_map(
        _sharded_step,
        mesh=mesh,
        in_specs=(
            P("frames", "atoms", None),  # positions
            P("frames", None),  # box
            P("frames"),  # frame mask
            P("atoms"),  # mask_a
            P("atoms"),  # mask_b
            P("atoms"),  # masses
            P("atoms", None),  # ref_local
            P(),  # ref_center
            P(),  # ref_wsum
        ),
        out_specs={
            "com": P("frames", None),
            "distance": P("frames"),
            "rmsd": P("frames"),
            "mean_com": P(),
        },
        check_rep=False,
    )
    return jax.jit(smapped)
