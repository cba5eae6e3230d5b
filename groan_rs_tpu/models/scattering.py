"""Small-angle scattering curves (SAXS/SANS Debye sums with Cromer-Mann / neutron b tables).

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
    _CROMER_MANN,
    _NEUTRON_B,
    _resident_group_pos,
)


def _cm_form_factors(symbols, q_nm):
    """[K, Q] X-ray form factors for element `symbols` at scattering
    vectors `q_nm` (1/nm).  Raises GroupError on unknown elements."""
    q_a = np.asarray(q_nm, np.float64) / 10.0        # 1/nm -> 1/Angstrom
    s2 = (q_a / (4.0 * np.pi)) ** 2
    uniq = sorted(set(symbols))
    missing = [u for u in uniq if u.upper() not in _CROMER_MANN]
    if missing:
        raise GroupError(
            f"no Cromer-Mann form factors for element(s) {missing}; run "
            "guess_elements() or restrict the group", code="InvalidElement")
    table = {}
    for u in uniq:
        a, b, c = _CROMER_MANN[u.upper()]
        table[u] = (np.exp(-np.outer(b, s2)) * np.asarray(a)[:, None]
                    ).sum(axis=0) + c
    return np.stack([table[s] for s in symbols])

def saxs(system, trajectory, group: str, *, q=None, batch_size: int = 32,
         chunk: int = 256):
    """Small-angle X-ray scattering intensity by the Debye formula
    (surpass — the `gmx saxs` workload; absent from the reference).

    I(q) = sum_ij f_i(q) f_j(q) sinc(q d_ij) with Cromer-Mann atomic
    form factors, averaged over frames.  Distances are plain Euclidean
    (in-vacuo convention — make the group whole first); the O(K^2 Q)
    sum evaluates on device as row tiles: per q and row chunk, one
    [C, K] sinc matrix contracted against the form-factor vectors
    (`lax.map` over q, `lax.scan` over chunks and frames — frames
    batched in one dispatch).

    `q`: scattering vectors in 1/nm (default 60 points on [0.06, 6]).
    Elements must be assigned (`guess_elements()`).

    Returns a dict: 'q' [Q] (1/nm), 'intensity' [Q] frame-averaged,
    'per_frame' [F, Q], 'i0' = (sum f_i(0))^2 per frame 0 sanity value.
    """
    import jax
    import jax.numpy as jnp

    gsel, pos, boxes, _ = _resident_group_pos(
        system, trajectory, group, batch_size)

    if q is None:
        q = np.linspace(0.06, 6.0, 60)
    q = np.asarray(q, np.float64)
    if (q <= 0).any():
        raise ParallelError("q values must be positive (1/nm)")

    symbols = _group_elements(system, gsel, group)
    ff = _cm_form_factors(symbols, q)                # [K, Q]
    iq = _debye_curve(pos, ff, q, chunk)             # [F, Q]
    return {"q": q, "intensity": iq.mean(axis=0), "per_frame": iq,
            "i0": float(ff[:, 0].sum() ** 2)}

def _group_elements(system, gsel, group):
    symbols = [system.topology.element_symbol[int(i)] for i in gsel]
    if any(not s for s in symbols):
        raise GroupError(
            f"group '{group}' has atoms without an element symbol; run "
            "guess_elements()", code="InvalidElement")
    return symbols

def _debye_curve(pos, ff, q, chunk):
    """Debye sum on device: pos [F,K,3] (device), ff [K,Q] scattering
    amplitudes, q [Q] (1/nm) -> per-frame intensities [F, Q].  Row tiles
    of `chunk` atoms; lax.map over q, scan over frames and chunks."""
    import jax
    import jax.numpy as jnp

    f, k = int(pos.shape[0]), int(pos.shape[1])
    n_chunks = -(-k // chunk)
    pad = n_chunks * chunk - k
    ffp = np.concatenate([ff, np.zeros((pad, ff.shape[1]))]) if pad else ff

    @jax.jit
    def _debye(pos, ffq, qv):
        posp = jnp.concatenate(
            [pos, jnp.zeros((f, pad, 3), pos.dtype)], axis=1) if pad else pos

        def one_q(args):
            qs, fq = args                            # scalar, [K+pad]

            def frames(_, pf):                       # pf [K+pad, 3]
                def rows(acc, start):
                    c = jax.lax.dynamic_slice_in_dim(pf, start, chunk)
                    fc = jax.lax.dynamic_slice_in_dim(fq, start, chunk)
                    d = c[:, None, :] - pf[None, :k, :]
                    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))   # [C, K]
                    s = jnp.sinc(qs * dist / jnp.pi)
                    return acc + jnp.dot(fc, jnp.dot(s, fq[:k])), None

                acc, _ = jax.lax.scan(
                    rows, jnp.float32(0.0), jnp.arange(n_chunks) * chunk)
                return None, acc

            _, i_f = jax.lax.scan(frames, None, posp)
            return i_f                               # [F]

        return jax.lax.map(one_q, (qv, ffq))         # [Q, F]

    return np.asarray(
        _debye(pos, jnp.asarray(ffp.T, jnp.float32),
               jnp.asarray(q, jnp.float32)), np.float64).T   # [F, Q]

def sans(system, trajectory, group: str, *, q=None, deuterate: bool = False,
         batch_size: int = 32, chunk: int = 256):
    """Small-angle neutron scattering by the Debye formula (surpass —
    the `gmx sans` workload; absent from the reference).

    Identical machinery to `saxs` but with q-independent coherent
    neutron scattering lengths b_i (fm; Sears 1992): I(q) =
    sum_ij b_i b_j sinc(q d_ij), frame-averaged.  `deuterate=True`
    swaps every hydrogen's b for deuterium's (contrast variation).

    Returns a dict: 'q' [Q] (1/nm), 'intensity' [Q] (fm^2),
    'per_frame' [F, Q], 'i0' = (sum b_i)^2.
    """
    gsel, pos, boxes, _ = _resident_group_pos(
        system, trajectory, group, batch_size)

    if q is None:
        q = np.linspace(0.06, 6.0, 60)
    q = np.asarray(q, np.float64)
    if (q <= 0).any():
        raise ParallelError("q values must be positive (1/nm)")

    symbols = _group_elements(system, gsel, group)
    missing = sorted({s for s in symbols if s.upper() not in _NEUTRON_B})
    if missing:
        raise GroupError(
            f"no neutron scattering length for element(s) {missing}",
            code="InvalidElement")
    b = np.array([_NEUTRON_B["D" if deuterate and s.upper() == "H"
                             else s.upper()] for s in symbols])
    ff = np.repeat(b[:, None], q.size, axis=1)       # [K, Q]
    iq = _debye_curve(pos, ff, q, chunk)
    return {"q": q, "intensity": iq.mean(axis=0), "per_frame": iq,
            "i0": float(b.sum() ** 2)}
