"""Third one-lease TPU batch (supersedes tpu_queue2.py — same A/Bs plus
the flow sweep-count bench; run after tpu_queue.py's study finishes).

Order (fast A/Bs first so a tunnel death can't take them out):

1. bench with MESHRECON_HS_FUSED_MIN_PX=500000 — does the fused band
   kernel beat the XLA sweeps at the 0.92 Mpix bench stack?
2. fused_breakdown at the production default threshold — fresh stage
   split for the perf roadmap.
3. bench at MESHRECON_FLOW_ITERS 14 and 12 (production threshold) — the
   wall-time payoff of fewer Chebyshev sweeps; the e2e quality cost is
   measured separately on CPU (tools/iters_study.py).
4. seed_study A/Bs at fixed cameras: flow-solver jacobi-vs-cheb and the
   16k render-proxy cap (NOTES_ROUND4 items).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_queue3.py \
           [--study-configs jac,rf16k] [--study-seeds 3,4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# must precede any meshrecon.flow import: read at module import and baked
# into traces
os.environ["MESHRECON_HS_FUSED_MIN_PX"] = "500000"


def _rebench(tag: str):
    import bench

    print(f"=== bench {tag} ({time.strftime('%H:%M:%S')})", flush=True)
    return bench.main() or 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--study-configs", default="jac,rf16k")
    ap.add_argument("--study-seeds", default="3,4")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-breakdown", action="store_true")
    ap.add_argument("--skip-iters", action="store_true")
    ap.add_argument("--skip-study", action="store_true")
    args = ap.parse_args(argv)

    from meshrecon.utils.tunnel import axon_expected, tunnel_alive

    if axon_expected() and not tunnel_alive():
        print("tpu_queue3: tunnel down — aborting before backend init",
              file=sys.stderr)
        return 2

    rc = 0
    if not args.skip_bench:
        rc |= _rebench("MIN_PX=5e5")

    import jax

    from meshrecon.flow import variational

    if not args.skip_breakdown:
        print(f"=== fused_breakdown, default threshold "
              f"({time.strftime('%H:%M:%S')})", flush=True)
        variational._HS_FUSED_MIN_PX = 2_000_000
        jax.clear_caches()  # the global is baked into existing traces
        import fused_breakdown

        saved_argv = sys.argv
        sys.argv = ["fused_breakdown", "480", "640", "3", "10", "1", "cheb"]
        try:
            rc |= fused_breakdown.main() or 0
        finally:
            sys.argv = saved_argv

    if not args.skip_iters:
        variational._HS_FUSED_MIN_PX = 2_000_000
        for iters in (14, 12):
            variational._FLOW_ITERS = iters
            jax.clear_caches()
            rc |= _rebench(f"FLOW_ITERS={iters}")
        variational._FLOW_ITERS = 0
        jax.clear_caches()

    if not args.skip_study:
        print(f"=== seed study {args.study_configs} "
              f"({time.strftime('%H:%M:%S')})", flush=True)
        import seed_study

        rc |= seed_study.main(["--scale", "1", "--seeds", args.study_seeds,
                               "--configs", args.study_configs]) or 0

        # full-res quality gate for the 14-sweep default flip (1/8-res CPU
        # study showed iters=14 quality-neutral; full-res displacements are
        # 8x larger in pixels, so re-check before trusting it)
        print(f"=== seed study trim2 @ FLOW_ITERS=14 "
              f"({time.strftime('%H:%M:%S')})", flush=True)
        variational._FLOW_ITERS = 14
        jax.clear_caches()
        rc |= seed_study.main(["--scale", "1", "--seeds", "3,4,5",
                               "--configs", "trim2"]) or 0
        variational._FLOW_ITERS = 0
        jax.clear_caches()

        # queue-1 verdict: full-res trim2 leaves seeds 3/5 at med ~0.18 —
        # the tail is SUPPORTED by bad-draw points, so the draw-luck
        # levers are next: 2-draw ensemble union and sweep-passes-2+trim
        print(f"=== seed study trim2ens2,trim2sp2 "
              f"({time.strftime('%H:%M:%S')})", flush=True)
        rc |= seed_study.main(["--scale", "1", "--seeds", "3,4,5",
                               "--configs", "trim2ens2,trim2sp2"]) or 0

    print(f"=== queue3 done rc={rc} ({time.strftime('%H:%M:%S')})",
          flush=True)
    return rc


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tools")
    sys.exit(main())
