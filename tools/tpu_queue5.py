"""Fifth one-lease TPU batch — run after tpu_queue4.py exits.

Queue4 found two bit-exact config wins at bench size (defaults 20.84
Mpix/s that session): MESHRECON_RASTER_TILE_H=24 -> 27.96 and
MESHRECON_HS_FUSED_MIN_PX=5e5 -> 22.72 (single-chunk cheb). This batch:

1. bench with BOTH knobs combined (candidate new defaults) + taller-tile
   probes (32, 48).
2. raster_sweep at TILE_H=8 vs 24 at production face counts (16k/65k
   tris) — taller tiles bin more tris per tile; confirm no large-mesh
   regression before flipping the default.
3. The quality studies queue3 lost when the session died: trim2ens2
   (2-draw ensemble union) and trim2sp2, plus the new trim2mb12 bundle
   floor — bad seeds first (3,5), seed 4 if the lease survives.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_queue5.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# candidate defaults must precede meshrecon imports (read at module import)
os.environ.setdefault("MESHRECON_RASTER_TILE_H", "24")
os.environ.setdefault("MESHRECON_HS_FUSED_MIN_PX", "500000")


def _rebench(tag: str):
    import bench

    print(f"=== bench {tag} ({time.strftime('%H:%M:%S')})", flush=True)
    return bench.main() or 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-raster", action="store_true")
    # the single most promising full-res lever first — trim2sp2/trim2mb8
    # have 1/8-res data and ride only if the lease survives a re-run
    ap.add_argument("--study-configs", default="trim2ens2")
    ap.add_argument("--study-seeds", default="3,5")
    ap.add_argument("--skip-study", action="store_true")
    args = ap.parse_args(argv)

    from meshrecon.utils.tunnel import axon_expected, tunnel_alive

    if axon_expected() and not tunnel_alive():
        print("tpu_queue5: tunnel down — aborting before backend init",
              file=sys.stderr)
        return 2

    rc = 0
    if not args.skip_bench:
        import jax

        import meshrecon.raster.binned as rb

        rc |= _rebench("TILE_H=24 + MIN_PX=5e5 (candidate defaults)")
        for th in (32, 48):
            rb.TILE_H = th
            jax.clear_caches()
            rc |= _rebench(f"TILE_H={th} + MIN_PX=5e5")
        rb.TILE_H = 24
        jax.clear_caches()

    if not args.skip_raster:
        import jax

        import meshrecon.raster.binned as rb
        import raster_sweep

        sys.argv = ["raster_sweep", "8"]  # production chunk only
        for th in (8, 24):
            rb.TILE_H = th
            jax.clear_caches()
            print(f"=== raster_sweep TILE_H={th} "
                  f"({time.strftime('%H:%M:%S')})", flush=True)
            rc |= raster_sweep.main() or 0
        rb.TILE_H = 24
        jax.clear_caches()

    if not args.skip_study:
        print(f"=== seed study {args.study_configs} "
              f"({time.strftime('%H:%M:%S')})", flush=True)
        import seed_study

        rc |= seed_study.main(["--scale", "1", "--seeds", args.study_seeds,
                               "--configs", args.study_configs]) or 0

    print(f"=== queue5 done rc={rc} ({time.strftime('%H:%M:%S')})",
          flush=True)
    return rc


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tools")
    sys.exit(main())
