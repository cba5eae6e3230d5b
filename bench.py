#!/usr/bin/env python
"""North-star benchmark: 1M-atom XTC dist+COM+RMSD pass (frames/sec/chip).

Builds (once, cached) a synthetic 1M-atom system with water-like atom
triplets and a multi-frame XTC written by the native codec, then times the
full pipeline: native threaded decode -> device transfer -> one jitted step
per batch computing refined Bai-Breen COM ("protein" group), PBC distance
between two group centers, and mass-weighted Kabsch RMSD vs frame 0.

Baseline anchor (BASELINE.md row 1): groan_rs single-thread full-system XTC
pass at ~47 M atom-frames/s == 47 frames/s at 1M atoms.

Prints exactly ONE JSON line to stdout.
"""

import json
import os
import sys
import time

import numpy as np

N_ATOMS = int(os.environ.get("BENCH_ATOMS", 1_000_000))
N_FRAMES = int(os.environ.get("BENCH_FRAMES", 24))
BATCH = int(os.environ.get("BENCH_BATCH", 8))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
BASELINE_FRAMES_PER_SEC = 47.0e6 / N_ATOMS  # reference atom-frames/s anchor


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_trajectory(path):
    """Synthesize a water-like trajectory and write it with the native codec."""
    from groan_rs_tpu.io import native

    rng = np.random.default_rng(42)
    box = np.array([21.0, 21.0, 21.0], np.float32)
    n_mol = N_ATOMS // 3
    centers = rng.uniform(0, 1, size=(n_mol, 3)).astype(np.float32) * box
    offsets = rng.normal(size=(n_mol, 2, 3)).astype(np.float32) * 0.06
    pos = np.empty((N_ATOMS, 3), np.float32)
    pos[0::3] = centers
    pos[1::3] = centers + offsets[:, 0]
    pos[2::3] = centers + offsets[:, 1]
    pos %= box

    box33 = np.diag(box).astype(np.float32).reshape(9)
    drift_rng = np.random.default_rng(7)
    cur = pos.copy()
    for f in range(N_FRAMES):
        if f:
            cur = (cur + drift_rng.normal(size=(1, 3)).astype(np.float32) * 0.05
                   + drift_rng.normal(size=cur.shape).astype(np.float32) * 0.01) % box
        native.xtc_write_frame(path, N_ATOMS, f * 1000, f * 10.0, box33, cur, 1000.0)
        log(f"  wrote frame {f + 1}/{N_FRAMES}")
    return box


def main():
    t_setup = time.perf_counter()
    os.makedirs(CACHE, exist_ok=True)
    xtc = os.path.join(CACHE, f"bench_{N_ATOMS}_{N_FRAMES}.xtc")
    if not os.path.exists(xtc):
        log(f"building {N_ATOMS}-atom x {N_FRAMES}-frame trajectory...")
        build_trajectory(xtc)
    log(f"setup: {time.perf_counter() - t_setup:.1f}s")

    import jax
    import jax.numpy as jnp

    from groan_rs_tpu.io import native
    from groan_rs_tpu.ops import center as center_ops
    from groan_rs_tpu.ops import pbc
    from groan_rs_tpu.ops import rmsd as rmsd_ops

    log(f"devices: {jax.devices()}")

    offsets, steps, times, natoms = native.xtc_scan(xtc)
    assert natoms == N_ATOMS

    # groups: "protein" = first 99k atoms, "membrane" = next 300k
    n_prot = min(99_000, N_ATOMS // 10)
    n_mem = min(300_000, N_ATOMS // 3)
    idx_prot = np.arange(n_prot)
    idx_mem = np.arange(n_prot, n_prot + n_mem)
    rng = np.random.default_rng(3)
    masses = rng.uniform(1.0, 16.0, size=N_ATOMS).astype(np.float32)
    w_prot = jnp.asarray(masses[idx_prot])

    # reference frame for RMSD: frame 0 protein coords prepared
    c0, b0, *_ = native.xtc_read_frames(xtc, offsets[:1], natoms)
    box_l = b0[0][[0, 4, 8]]
    ref, ref_center = rmsd_ops.prepare_coords(c0[0][idx_prot], box_l, weights=masses[idx_prot])
    ref = jnp.asarray(ref)
    ref_center = jnp.asarray(ref_center)

    ji_prot = jnp.asarray(idx_prot)
    ji_mem = jnp.asarray(idx_mem)

    @jax.jit
    def step(positions, boxes):
        b = boxes[:, None, :]
        ga = jnp.take(positions, ji_prot, axis=1)
        gb = jnp.take(positions, ji_mem, axis=1)
        com = center_ops.center(ga, b, weights=w_prot)
        cog = center_ops.center(gb, b)
        dist = pbc.distance(com, cog, boxes)
        _, rms = rmsd_ops.rmsd_frames(ref, ref_center, ga, boxes, w_prot)
        return com, dist, rms

    def run_pass():
        results = []
        n_threads = native.n_default_threads()
        chunks = [np.arange(i, min(i + BATCH, N_FRAMES)) for i in range(0, N_FRAMES, BATCH)]

        # double-buffered host decode
        import threading

        staged = {}

        def decode(ci):
            coords, boxes9, _, _, _ = native.xtc_read_frames(
                xtc, offsets[chunks[ci]], natoms, n_threads=n_threads
            )
            staged[ci] = (coords, boxes9[:, [0, 4, 8]] if boxes9.shape[1] == 9 else boxes9)

        th = threading.Thread(target=decode, args=(0,))
        th.start()
        outs = []
        for ci in range(len(chunks)):
            th.join()
            coords, boxes = staged.pop(ci)
            if ci + 1 < len(chunks):
                th = threading.Thread(target=decode, args=(ci + 1,))
                th.start()
            com, dist, rms = step(jnp.asarray(coords), jnp.asarray(boxes))
            outs.append((com, dist, rms))
        jax.block_until_ready(outs)
        return outs

    # warmup (compiles)
    log("warmup pass...")
    outs = run_pass()

    # parity spot-check: frame-0 COM vs float64 host reference
    com0 = np.asarray(outs[0][0][0], np.float64)
    p = c0[0][idx_prot].astype(np.float64)
    w = masses[idx_prot].astype(np.float64)
    # naive COM is valid here (group is compact, not PBC-split)
    ref_host = (p * w[:, None]).sum(0) / w.sum()
    d = np.abs(com0 - ref_host)
    d = np.minimum(d, np.abs(d - box_l))  # allow wrap-equivalent
    parity_ok = bool((d < 1e-2).all())
    rms0 = float(np.asarray(outs[0][2][0]))
    parity_ok &= rms0 < 1e-3  # self-RMSD of reference frame

    log("timed passes...")
    best = float("inf")
    for _ in range(int(os.environ.get("BENCH_REPS", 3))):
        t0 = time.perf_counter()
        run_pass()
        best = min(best, time.perf_counter() - t0)

    fps = N_FRAMES / best
    result = {
        "metric": "frames/sec/chip, 1M-atom XTC dist+COM+RMSD pass; float32 parity vs groan_rs",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC, 3),
        "n_atoms": N_ATOMS,
        "n_frames": N_FRAMES,
        "pass_seconds": round(best, 3),
        "atom_frames_per_sec": round(fps * N_ATOMS / 1e6, 1),
        "parity_ok": parity_ok,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
