"""Second one-lease TPU batch (run after tpu_queue.py's study finishes).

Covers the round-4 A/Bs that queue 1 could not carry (its seed_study
import captured the config table before the new entries existed, and the
fused-band threshold must be fixed per process):

1. bench with MESHRECON_HS_FUSED_MIN_PX=500000 — does the fused band
   kernel beat the XLA sweeps at the 0.92 Mpix bench stack? Compare the
   printed Mpix/s against queue 1's default-threshold number.
2. fused_breakdown at the production default threshold (module attr
   restored + jit caches cleared so the changed Python global actually
   retraces) — the fresh stage split for the perf roadmap.
3. seed_study A/Bs at fixed cameras: flow-solver jacobi-vs-cheb
   (NOTES_ROUND4 item 4) and the 16k render-proxy cap.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_queue2.py \
           [--study-configs jac,rf16k] [--study-seeds 3,4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# must precede any meshrecon.flow import: the threshold is read at module
# import and baked into traces
os.environ["MESHRECON_HS_FUSED_MIN_PX"] = "500000"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--study-configs", default="jac,rf16k")
    ap.add_argument("--study-seeds", default="3,4")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-breakdown", action="store_true")
    ap.add_argument("--skip-study", action="store_true")
    args = ap.parse_args(argv)

    from meshrecon.utils.tunnel import axon_expected, tunnel_alive

    if axon_expected() and not tunnel_alive():
        print("tpu_queue2: tunnel down — aborting before backend init",
              file=sys.stderr)
        return 2

    rc = 0
    if not args.skip_bench:
        print(f"=== bench MIN_PX=5e5 ({time.strftime('%H:%M:%S')})",
              flush=True)
        import bench

        rc |= bench.main() or 0

    if not args.skip_breakdown:
        print(f"=== fused_breakdown, default threshold "
              f"({time.strftime('%H:%M:%S')})", flush=True)
        import jax

        from meshrecon.flow import variational

        variational._HS_FUSED_MIN_PX = 2_000_000
        jax.clear_caches()  # the global is baked into existing traces
        import fused_breakdown

        saved_argv = sys.argv
        sys.argv = ["fused_breakdown", "480", "640", "3", "10", "1", "cheb"]
        try:
            rc |= fused_breakdown.main() or 0
        finally:
            sys.argv = saved_argv
        jax.clear_caches()

    if not args.skip_study:
        print(f"=== seed study {args.study_configs} "
              f"({time.strftime('%H:%M:%S')})", flush=True)
        import seed_study

        rc |= seed_study.main(["--scale", "1", "--seeds", args.study_seeds,
                               "--configs", args.study_configs]) or 0

    print(f"=== queue2 done rc={rc} ({time.strftime('%H:%M:%S')})",
          flush=True)
    return rc


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tools")
    sys.exit(main())
