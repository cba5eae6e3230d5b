#!/usr/bin/env python
"""Round-4 feature tour: native TNG (GROMACS tng_compress) reading and
velocity observables on the batched fast path.

Run (CPU works fine):
    env JAX_PLATFORMS=cpu python examples/tng_and_velocities.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = "/root/reference/test_files"


def main():
    from groan_rs_tpu.models import TrajectoryAnalysis
    from groan_rs_tpu.system import System

    # --- TNG: GROMACS' default tng_compress coding decodes natively ----
    # (the reference needs the external chemfiles C++ library for this;
    # here the reverse-engineered XTC2 coder reads it bit-exactly)
    s = System.from_file(os.path.join(FIXTURES, "example.gro"))
    tng = os.path.join(FIXTURES, "short_trajectory.tng")
    frames = 0
    for fr in s.tng_iter(tng):
        frames += 1
    print(f"TNG frames read natively: {frames}")

    # the same trajectory through the batched pipeline
    s2 = System.from_file(os.path.join(FIXTURES, "example.tpr"))
    s2.group_create("Protein", "@protein")
    out = (TrajectoryAnalysis(s2)
           .add_com("Protein")
           .run(tng, batch_size=4))
    print("per-frame protein COM from TNG:", np.asarray(out["com_Protein"])[0])

    # --- TNG *writing* with GROMACS' own compression (codec="tng") -----
    # (the reference cannot write TNG at all; gzip codec is the lossless
    # default, codec="tng" quantizes like XTC at `multiplier` ints/nm)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        out_tng = os.path.join(td, "rewritten.tng")
        s3 = System.from_file(os.path.join(FIXTURES, "example.gro"))
        s3.traj_writer_init(out_tng, fmt="tng", codec="tng", multiplier=1000.0)
        for fr in s3.tng_iter(tng):
            fr.traj_write_frame()
        s3.traj_writers_close()
        from groan_rs_tpu.io.tng import tng_info
        info = tng_info(out_tng)
        print(f"rewrote {info['n_frames']} frames with codec-2 XTC2 "
              f"({os.path.getsize(out_tng)} bytes, "
              f"POSITIONS codec {info['codecs']['POSITIONS']})")

    # --- velocities: TRR x/v/f ride the engine as aux channels ---------
    trr = os.path.join(FIXTURES, "short_trajectory.trr")
    pipe = (TrajectoryAnalysis(s2)
            .add_kinetic_energy("Protein", name="ke")
            .add_temperature("Protein", name="T")
            .add_velocity_step(
                "vmax",
                lambda pos, vel, boxes, mask:
                abs(vel).max(axis=(1, 2))))
    vout = pipe.runner().run(trr, batch_size=4)
    print("kinetic energy [kJ/mol] per frame:",
          np.round(np.asarray(vout["ke"]), 1))
    print("kinetic temperature [K] per frame:",
          np.round(np.asarray(vout["T"]), 1))
    print("max |v| per frame:", np.round(np.asarray(vout["vmax"]), 3))


if __name__ == "__main__":
    main()
