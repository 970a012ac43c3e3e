"""Fourth one-lease TPU batch — run after tpu_queue3.py exits.

Covers the session's two code changes that need on-hardware numbers:

1. verify-tpu: asserts the NEW single-chunk fused Chebyshev matches the
   global XLA schedule bit-near on hardware (the restarted schedule it
   replaces silently weakened the production full-res solver).
2. bench at defaults — the headline with the cheb fix in.
3. bench at MESHRECON_HS_FUSED_MIN_PX=5e5 — re-A/B: single-chunk saves a
   launch + the cc round trip, so the fused kernel may now win at the
   0.92 Mpix bench stack (it lost 24.61 vs 24.93 with the restart).
4. raster tile-height A/B: bench at MESHRECON_RASTER_TILE_H=16 and 24
   (renders are 2.46 ms of the 11.8 ms update at 1200 grid steps; taller
   tiles halve/third the step count, bit-exact).
5. seed_study trim2 seeds 3,4,5 — the quality question: does the cheb
   fix recover the round-2 full-res median (0.125 r at seed 3 vs the
   restarted-cheb 0.188)?

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_queue4.py
"""

from __future__ import annotations

import argparse
import sys
import time


def _rebench(tag: str):
    import bench

    print(f"=== bench {tag} ({time.strftime('%H:%M:%S')})", flush=True)
    return bench.main() or 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-verify", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-raster", action="store_true")
    ap.add_argument("--skip-study", action="store_true")
    ap.add_argument("--study-configs", default="trim2")
    ap.add_argument("--study-seeds", default="3,4,5")
    args = ap.parse_args(argv)

    from meshrecon.utils.tunnel import axon_expected, tunnel_alive

    if axon_expected() and not tunnel_alive():
        print("tpu_queue4: tunnel down — aborting before backend init",
              file=sys.stderr)
        return 2

    rc = 0
    if not args.skip_verify:
        print(f"=== verify-tpu ({time.strftime('%H:%M:%S')})", flush=True)
        import verify_tpu

        rc |= verify_tpu.main() or 0

    import jax

    from meshrecon.flow import variational

    if not args.skip_bench:
        rc |= _rebench("defaults (cheb fix)")
        variational._HS_FUSED_MIN_PX = 500_000
        jax.clear_caches()
        rc |= _rebench("MIN_PX=5e5 single-chunk")
        variational._HS_FUSED_MIN_PX = 2_000_000
        jax.clear_caches()

    if not args.skip_raster:
        import meshrecon.raster.binned as rb

        for th in (16, 24):
            rb.TILE_H = th
            jax.clear_caches()
            rc |= _rebench(f"RASTER_TILE_H={th}")
        rb.TILE_H = 8
        jax.clear_caches()

    if not args.skip_study:
        print(f"=== seed study {args.study_configs} (cheb fix) "
              f"({time.strftime('%H:%M:%S')})", flush=True)
        import seed_study

        rc |= seed_study.main(["--scale", "1", "--seeds", args.study_seeds,
                               "--configs", args.study_configs]) or 0

    print(f"=== queue4 done rc={rc} ({time.strftime('%H:%M:%S')})",
          flush=True)
    return rc


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tools")
    sys.exit(main())
