"""Cumulative-stage timing inside fused_main_update at 640x480, K=3.

Times progressively larger prefixes of the fused program (in-program reps,
same honest-barrier scheme as perf_breakdown.py) so each stage's MARGINAL
cost in its real context (vmapped over K, fused with neighbors) is visible.

Alongside each stage it prints XLA's own cost model for the stage prefix
(bytes accessed + flops, from lowered cost_analysis), so the roofline memo
can bound every stage by max(bytes/BW, flops/peak) with measured ceilings
from tools/roofline.py. The dispatch floor is MEASURED per run (a no-op
scalar jit, best of 5) instead of the old hardcoded 30 ms — through the
axon tunnel the floor drifts 20-35 ms between minutes, which at reps=10
was +-1 ms/update of noise on every marginal.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/fused_breakdown.py [H W K reps B solver]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    B = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    solver = sys.argv[6] if len(sys.argv) > 6 else "mg"

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from meshrecon.pipeline import fused as F

    print(f"# {jax.devices()}  {H}x{W} K={K} reps={reps} B={B}", flush=True)

    (soup, soup_valid, mains, fm, sides, fs, sv, centers, cvalid, ns) = (
        g._fused_problem(b=B, k=K, h=H, w=W, seed=0)
    )
    args = jax.device_put(
        (soup, soup_valid, mains, fm, sides, fs, sv, centers, cvalid, ns))

    def stage_fn(upto):
        def batched(eps, soup, soup_valid, cam_mains, frames_main, side_cams,
                    side_frames, side_valid, centers, centers_valid, n_side):
            # eps perturbs EVERY input so no stage is loop-invariant (XLA
            # would hoist an eps-free render chain out of the rep loop,
            # silently crediting its cost to whichever stage first consumes
            # a perturbed value)
            soup = jnp.asarray(soup, jnp.float32) + eps
            side_frames = jnp.asarray(side_frames, jnp.float32) + eps
            frames_main = jnp.asarray(frames_main, jnp.float32) + eps
            side_cams = jnp.asarray(side_cams, jnp.float32)
            side_valid = jnp.asarray(side_valid)
            b, k = side_frames.shape[:2]
            depth_batched = F._depth_batched_fn(None, H, W)
            all_cams = jnp.concatenate([cam_mains[:, None], side_cams],
                                       axis=1)
            all_depths = depth_batched(
                all_cams.reshape(b * (k + 1), 4, 4), soup, soup_valid
            ).reshape(b, k + 1, H, W)
            depth0 = all_depths[:, 0]
            if upto == "depth0":
                return all_depths

            intens, masks = F.projected_image_batched(
                cam_mains, depth0, side_frames, side_cams, all_depths[:, 1:])
            depth = depth0
            mixed_list = []
            for i in range(k):
                mixed, new_depth = F.mix_background(intens[:, i], masks[:, i],
                                                    frames_main, depth)
                depth = jnp.where(side_valid[:, i, None, None], new_depth,
                                  depth)
                mixed_list.append(mixed)
            depth_final = depth
            mixed_all = jnp.stack(mixed_list, axis=1)
            if upto == "scan":
                return depth_final, mixed_all

            flows2 = F.variational_flow(frames_main[:, None], mixed_all,
                                        solver=solver, levels=3)
            if upto == "flow":
                return depth_final, flows2

            # mirror the production variance path exactly (fused.py):
            # bicubic tile-warp at the relaxed-budget radii, then compare
            if F._sampling_engine() == "pallas":
                from meshrecon.flow.tile_warp import tile_warp_flow_batched
                rewarped = tile_warp_flow_batched(mixed_all, flows2,
                                                  taps=F._VARIANCE_TAPS,
                                                  r_row=6, r_col=8)
            else:
                rewarped = jax.vmap(jax.vmap(F.flow_remap))(flows2, mixed_all)
            if upto == "rewarp":
                return depth_final, flows2, rewarped
            var = F.compare(frames_main[:, None], rewarped)
            if upto == "var":
                return depth_final, flows2, var

            out = jax.vmap(
                lambda fx, fy, vv, cm, sc, sv, d: F.triangulate_pixels(
                    (fx, fy, vv), cm, sc, sv, d, sampling="taylor")
            )(flows2[..., 0], flows2[..., 1], var,
              cam_mains, side_cams, side_valid, depth_final)
            if upto == "tri":
                return out
            normals = jax.vmap(F.estimate_normals)(
                out["point4"], out["valid"], out["pdf"], centers,
                centers_valid, n_side)
            return out["point4"], normals, out["pdf"], out["valid"]
        return batched

    # cost-only mode: print the XLA cost model per stage prefix and skip
    # timing entirely — the axon PJRT plugin does not implement
    # cost_analysis, so the bytes/flops columns are produced by a CPU
    # lowering (HLO-level costs; backend-independent at this altitude)
    # while the ms columns come from the on-TPU timing run.
    import os
    if os.environ.get("MESHRECON_BREAKDOWN_COST_ONLY"):
        prev_fl, prev_by = 0.0, 0.0
        for name in ["depth0", "scan", "flow", "rewarp", "var", "tri",
                     "all"]:
            fn = stage_fn(name)

            def once(*a, _fn=fn):
                return jnp.sum(sum(
                    jnp.sum(x) for x in jax.tree_util.tree_leaves(
                        _fn(jnp.float32(0.0), *a))
                    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)))

            ca = jax.jit(once).lower(*args).cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            fl = float(ca.get("flops", 0.0))
            by = float(ca.get("bytes accessed", 0.0))
            print(f"cost {name:<6} Gflop {fl / 1e9:8.2f}"
                  f" (+{(fl - prev_fl) / 1e9:7.2f})"
                  f"  MB {by / 1e6:9.1f} (+{(by - prev_by) / 1e6:8.1f})",
                  flush=True)
            prev_fl, prev_by = fl, by
        return 0

    # measured dispatch floor (drifts between minutes; best of 5)
    noop = jax.jit(lambda x: x * 1.0)
    float(np.asarray(noop(jnp.float32(1.0))))
    floor = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(noop(jnp.float32(1.0))))
        floor = min(floor, time.perf_counter() - t0)
    floor *= 1e3
    print(f"# dispatch floor {floor:.1f} ms", flush=True)

    def stage_cost(fn):
        """XLA cost model (flops, bytes accessed) for ONE unrolled stage
        prefix — reps=1, no rep loop, so the numbers are per-update."""
        def once(*a):
            return jnp.sum(sum(
                jnp.sum(x) for x in jax.tree_util.tree_leaves(
                    fn(jnp.float32(0.0), *a))
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)))
        try:
            ca = jax.jit(once).lower(*args).cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0)), float(
                ca.get("bytes accessed", 0.0))
        except Exception:
            return float("nan"), float("nan")

    prev = 0.0
    prev_fl, prev_by = 0.0, 0.0
    for name in ["depth0", "scan", "flow", "rewarp", "var", "tri", "all"]:
        fn = stage_fn(name)

        def red(eps, *a):
            return jnp.sum(sum(
                jnp.sum(x) for x in jax.tree_util.tree_leaves(fn(eps, *a))
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)))

        def many(*a):
            def body(i, acc):
                return acc * 1e-30 + red(acc * 1e-30, *a)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        fjit = jax.jit(many)
        t0 = time.perf_counter()
        float(np.asarray(fjit(*args)))
        tc = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(fjit(*args)))
            best = min(best, time.perf_counter() - t0)
        per = (best * 1e3 - floor) / reps
        fl, by = stage_cost(fn)
        print(f"upto {name:<6} {per:9.2f} ms  (+{per - prev:7.2f})"
              f"  dGflop {(fl - prev_fl) / 1e9:7.2f}"
              f"  dMB {(by - prev_by) / 1e6:8.1f}"
              f"  compile {tc:5.1f} s", flush=True)
        prev, prev_fl, prev_by = per, fl, by


if __name__ == "__main__":
    main()
