"""Mesh-quality harness: ground-truth error metrics on synthetic scenes.

Runs the full pipeline on scenes whose geometry is known analytically (the
synthetic sphere/plane fixtures are ray-traced from fitted primitives, so the
primitive IS the ground truth) and reports per-configuration surface error —
the quantitative counterpart of BASELINE.json's "meshes matching CPU
reference" criterion while the reference's sample videos are unavailable.

Usage: python tools/quality_harness.py [--scene tracks/koule-tr.yaml]
       [--scale 8] [--configs default,exact,plane-sweep,farneback]
Prints one table; exits nonzero if the default config misses the tolerance.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def surface_error(mesh, center, radius):
    """Median/p90 absolute distance of mesh vertices from the true sphere."""
    v3 = mesh.vertices[:, :3] / mesh.vertices[:, 3:4]
    err = np.abs(np.linalg.norm(v3 - center, axis=1) - radius)
    return float(np.median(err)), float(np.percentile(err, 90))


CONFIGS = {
    "default": {},
    "exact": {"sampling": "exact"},
    "plane-sweep": {"depth_mode": "plane-sweep", "sweep_depths": 48},
    "farneback": {"use_farneback": True},
    "n3": {"iteration_count": 3},
    "n2": {"iteration_count": 2},
    "smooth": {"poisson_sigma": 2.5},
    "grid96": {"poisson_grid": 96},
    # the CLI default: plane-sweep bootstrap, then flow refinement
    "hybrid": {"depth_mode": "hybrid", "iteration_count": 2,
               "sweep_depths": 48},
    "hybrid-n3": {"depth_mode": "hybrid", "iteration_count": 3,
                  "sweep_depths": 48},
    # support-distance trim of the hallucinated Poisson closure — the
    # round-3 flagship quality lever (med 7x, p90 10x at 1/8 res;
    # NOTES_ROUND4.md)
    "trim": {"depth_mode": "hybrid", "iteration_count": 2,
             "sweep_depths": 48, "poisson_trim": 2.0},
    "trim-sp2": {"depth_mode": "hybrid", "iteration_count": 2,
                 "sweep_depths": 48, "poisson_trim": 2.0,
                 "sweep_passes": 2},
    # union of two independent camera draws, meshed once
    "trim-ens2": {"depth_mode": "hybrid", "iteration_count": 2,
                  "sweep_depths": 48, "poisson_trim": 2.0,
                  "ensemble_seeds": (3, 13)},
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="tracks/koule-tr.yaml")
    ap.add_argument("--scale", type=int, default=8)
    ap.add_argument("--configs", default="default,exact,plane-sweep")
    ap.add_argument("--tolerance", type=float, default=0.15,
                    help="relative median-error tolerance for the default")
    args = ap.parse_args(argv)

    from meshrecon.io.tracks import load_tracks
    from meshrecon.io.synthetic import synthetic_frames, fit_sphere
    from meshrecon.pipeline.config import Config
    from meshrecon.pipeline.reconstruct import reconstruct

    track = load_tracks(args.scene)
    w = track.width // args.scale
    h = track.height // args.scale
    frames = synthetic_frames(track, w, h, mode="sphere", seed=0)
    center, radius = fit_sphere(track.bundles)

    rows = []
    failed = False
    for name in args.configs.split(","):
        kw = dict(iteration_count=1, poisson_grid=64)
        kw.update(CONFIGS[name])
        cfg = Config(track=track, frames=frames,
                     out_file_name=f"/tmp/quality_{name}.obj", seed=3, **kw)
        t0 = time.perf_counter()
        mesh = reconstruct(cfg)
        dt = time.perf_counter() - t0
        med, p90 = surface_error(mesh, center, radius)
        rows.append((name, len(mesh.faces), med / radius, p90 / radius, dt))
        if name == "default" and med / radius > args.tolerance:
            failed = True

    print(f"scene={args.scene} {w}x{h} true_radius={radius:.3f}")
    print(f"{'config':<14}{'faces':>8}{'med_err/r':>11}{'p90_err/r':>11}"
          f"{'seconds':>9}")
    for name, faces, med, p90, dt in rows:
        print(f"{name:<14}{faces:>8}{med:>11.4f}{p90:>11.4f}{dt:>9.1f}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
