"""One-lease TPU work queue: run the round's on-hardware checklist in a
single attached process (the axon tunnel is exclusive and lease handoff
between processes costs 10-15 min — batching everything into one process
pays the attach cost once).

Order: bench first (secure the headline number in case the tunnel dies
again — it did mid-round-3), then the kernel equality sweep, then the
full-res quality study.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_queue.py \
           [--study-configs trim2,trim2div] [--study-seeds 3,4,5]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--study-configs", default="trim2,trim2div")
    ap.add_argument("--study-seeds", default="3,4,5")
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-verify", action="store_true")
    ap.add_argument("--skip-study", action="store_true")
    args = ap.parse_args(argv)

    from meshrecon.utils.tunnel import axon_expected, tunnel_alive

    if axon_expected() and not tunnel_alive():
        print("tpu_queue: tunnel down — aborting before backend init",
              file=sys.stderr)
        return 2

    rc = 0
    if not args.skip_bench:
        print(f"=== bench ({time.strftime('%H:%M:%S')})", flush=True)
        import bench

        rc |= bench.main() or 0

    if not args.skip_verify:
        print(f"=== verify-tpu ({time.strftime('%H:%M:%S')})", flush=True)
        import verify_tpu

        rc |= verify_tpu.main() or 0

    if not args.skip_study:
        print(f"=== seed study {args.study_configs} "
              f"({time.strftime('%H:%M:%S')})", flush=True)
        import seed_study

        rc |= seed_study.main(["--scale", "1", "--seeds", args.study_seeds,
                               "--configs", args.study_configs]) or 0

    print(f"=== queue done rc={rc} ({time.strftime('%H:%M:%S')})",
          flush=True)
    return rc


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tools")
    sys.exit(main())
