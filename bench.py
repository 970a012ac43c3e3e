"""Benchmark: dense-depth throughput per chip (the BASELINE.json metric).

Times the fused dense-depth update — pyramidal variational flow against K=3
side projections, covariance-weighted Gauss-Newton depth triangulation, and
PCA normals — for 640x480 main frames, end to end on one chip. Reports
megapixels of dense depth produced per second; ``vs_baseline`` is relative to
the 100 Mpix/s/chip north-star target (BASELINE.md).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from meshrecon.sharding import dense_update_batch

    B, K, H, W = 4, 3, 480, 640
    args = g._problem(b=B, k=K, h=H, w=W, seed=0)
    args = jax.device_put(args)

    # reduce outputs to one scalar inside the program: the axon tunnel's
    # block_until_ready does not actually synchronize, so a host fetch of a
    # scalar is the only honest timing barrier
    def reduced(*a):
        p4, nrm, pdf, valid = dense_update_batch(*a, flow_quality="full")
        return (
            jnp.sum(p4) + jnp.sum(nrm) + jnp.sum(pdf)
            + jnp.sum(valid.astype(jnp.float32))
        )

    fn = jax.jit(reduced)
    float(np.asarray(fn(*args)))  # warmup / compile

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        s = float(np.asarray(fn(*args)))
    dt = time.perf_counter() - t0

    mpix = B * H * W * reps / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "dense_depth_throughput",
                "value": round(mpix, 3),
                "unit": "Mpix/s/chip",
                "vs_baseline": round(mpix / 100.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
