"""Public flow entry point matching the reference's calculateFlow contract.

calculateFlow (flow.cpp:19-42) returns a 4-channel field per pixel:
(fx, fy, variance, 0) where variance is the pyramid-summed L1 error between
`prev` and `next` warped by the flow. The algorithm switch mirrors the `-f`
CLI flag (configuration.cpp:94-96): Farneback-style polynomial expansion vs
the default variational scheme.
"""

from __future__ import annotations

import jax.numpy as jnp

from meshrecon.flow.pyramid import compare
from meshrecon.flow.remap import flow_remap
from meshrecon.flow.variational import variational_flow


def calculate_flow(prev, next_, use_farneback: bool = False):
    """Dense flow + per-pixel variance. Returns (H, W, 4) float32.

    prev: the real frame; next_: the reprojected prediction. Convention:
    ``next(x + flow(x)) ~= prev(x)`` so warping `next_` by the flow
    reconstructs `prev` (the reference's self-check, flow.cpp:133).
    """
    prev = jnp.asarray(prev, jnp.float32)
    next_ = jnp.asarray(next_, jnp.float32)
    if use_farneback:
        from meshrecon.flow.farneback import farneback_flow

        # size-dependent parameters like the reference (flow.cpp:24-26):
        # winsize = (h+w)/100, poly_sigma = (h+w)/1000, poly_n = 5 if
        # sigma < 1.5 else 7
        h, w = prev.shape
        poly_sigma = max((h + w) / 1000.0, 0.7)
        poly_n = 5 if poly_sigma < 1.5 else 7
        winsize = max((h + w) // 100, 5)
        flow = farneback_flow(prev, next_, poly_n=poly_n,
                              poly_sigma=poly_sigma, winsize=int(winsize))
    else:
        # explicit 2-level single-warp pyramid: this function is the
        # PIPELINE's flow entry (recon.cpp:96 analog) and must match the
        # fused path's arithmetic exactly (tests/test_pipeline.py
        # ::test_fused_matches_unfused). The library default stays deep
        # (levels=6, warps=2); standalone large-displacement callers rely
        # on it. Round-5 gate: BASELINE.md "lv2 flow-pyramid gate".
        flow = variational_flow(prev, next_, levels=2, warps=1)
    # variance via the true bicubic warp (flow.cpp:34); a clamped warp would
    # misreport variance exactly where flows are large
    variance = compare(prev, flow_remap(flow, next_))
    zeros = jnp.zeros_like(variance)
    return jnp.concatenate(
        [flow, variance[..., None], zeros[..., None]], axis=-1
    )
