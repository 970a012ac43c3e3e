import numpy as np

from meshrecon.points import filter_points, density_scores, build_half_edges
from meshrecon.points.filter import _greedy_numpy, DENSITY_LIMIT


def scalar_density(points3, radius_sq, max_iters=200):
    """Scalar float64 reference of the power iteration (heuristic.cpp:102-136)."""
    n = len(points3)
    ei, ej, w = build_half_edges(points3, radius_sq)
    density = np.ones(n)
    score = np.zeros(n)
    for _ in range(max_iters):
        score = np.zeros(n)
        for a, b, wt in zip(ei, ej, w):
            score[a] += density[b] * wt
            score[b] += density[a] * wt
        total = score.sum()
        new_density = np.minimum(score * (n / total), 2.0)
        change = np.mean((density - new_density) ** 2)
        density = new_density
        if change <= 1e-6:
            break
    return density, score


def test_half_edges_squared_metric():
    pts = np.array([[0, 0, 0], [0.5, 0, 0], [2.0, 0, 0]], np.float64)
    ei, ej, w = build_half_edges(pts, 1.0)  # squared radius 1.0
    # only the pair (0,1): d^2 = 0.25 <= 1; pair (1,2): d^2 = 2.25 > 1
    assert len(ei) == 1
    assert (ej[0], ei[0]) == (0, 1)
    np.testing.assert_allclose(w[0], 1 - 0.25, rtol=1e-6)


def test_density_matches_scalar(rng):
    pts = rng.normal(size=(120, 3))
    r2 = 0.5
    d1, s1 = scalar_density(pts, r2)
    d2, s2, _ = density_scores(pts, r2)
    np.testing.assert_allclose(d1, d2, atol=2e-3)
    np.testing.assert_allclose(s1, s2, atol=2e-3)


def test_filter_removes_isolated_outliers(rng):
    cluster = rng.normal(scale=0.1, size=(200, 3))
    outliers = rng.normal(scale=0.1, size=(5, 3)) + 20.0  # far away, isolated-ish
    pts3 = np.concatenate([cluster, outliers])
    pts4 = np.concatenate([pts3, np.ones((len(pts3), 1))], axis=1).astype(np.float32)
    normals = rng.normal(size=(len(pts3), 3)).astype(np.float32)
    p_kept, n_kept, kept = filter_points(pts4, normals, radius_sq=0.02)
    assert len(p_kept) > 0
    # isolated far points have no neighbors -> score 0 -> dropped
    assert np.all(kept < 200), f"outliers kept: {kept[kept >= 200]}"
    assert p_kept.shape[1] == 4 and n_kept.shape[1] == 3
    # kept normals correspond to kept points
    np.testing.assert_array_equal(n_kept, normals[kept])


def test_filter_suppresses_redundant_duplicates(rng):
    base = rng.normal(scale=1.0, size=(100, 3))
    dup = base + rng.normal(scale=1e-4, size=base.shape)  # near-duplicates
    pts3 = np.concatenate([base, dup])
    pts4 = np.concatenate([pts3, np.ones((200, 1))], axis=1).astype(np.float32)
    normals = np.zeros((200, 3), np.float32)
    p_kept, _, kept = filter_points(pts4, normals, radius_sq=0.5)
    # suppression should drop a large share of the duplicated points
    assert len(kept) < 180


def test_native_greedy_matches_numpy(rng):
    n = 150
    pts = rng.normal(size=(n, 3))
    r2 = 0.8
    density, score, (ei, ej, w) = density_scores(pts, r2)
    order = np.argsort(-density, kind="stable").astype(np.int64)
    srt = np.argsort(ei, kind="stable")
    ei_s, ej_s, w_s = ei[srt], ej[srt], w[srt]
    ptr = np.zeros(n + 1, np.int64)
    np.add.at(ptr, ei_s + 1, 1)
    ptr = np.cumsum(ptr)
    ref = _greedy_numpy(order, score.astype(np.float32), density, ptr, ej_s,
                        w_s, DENSITY_LIMIT)
    from meshrecon.meshing.native import greedy_suppress_native

    nat = greedy_suppress_native(order, score.astype(np.float32), density,
                                 ptr, ej_s, w_s, DENSITY_LIMIT)
    if nat is None:
        import pytest

        pytest.skip("native lib unavailable")
    np.testing.assert_array_equal(ref, nat)


def test_host_power_iteration_matches_device(rng):
    from meshrecon.points.filter import (
        _power_iteration, _power_iteration_host, build_half_edges,
    )
    import jax.numpy as jnp

    pts = rng.normal(size=(200, 3))
    ei, ej, w = build_half_edges(pts, 0.6)
    n = len(pts)
    d_dev, s_dev = _power_iteration(jnp.asarray(ei), jnp.asarray(ej),
                                    jnp.asarray(w), n)
    d_host, s_host = _power_iteration_host(ei, ej, w.astype(np.float64), n)
    np.testing.assert_allclose(np.asarray(d_dev), d_host, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s_dev), s_host, atol=2e-3)


def test_full_native_filter_matches_python(rng):
    from meshrecon.meshing.native import filter_points_full_native
    from meshrecon.points.filter import density_scores, DENSITY_LIMIT

    pts = rng.normal(size=(400, 3)).astype(np.float32)
    out = filter_points_full_native(pts, 0.5, DENSITY_LIMIT, 64, 60)
    if out is None:
        import pytest

        pytest.skip("native lib unavailable")
    kept_nat, dens_nat, _ = out
    # compare densities against the python reference path
    dens_py, score_py, (ei, ej, w) = density_scores(pts, 0.5)
    np.testing.assert_allclose(dens_nat, dens_py, atol=5e-3)
    # run the python greedy on python scores and compare kept sets
    pts4 = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], axis=1)
    from meshrecon.points import filter_points

    _, _, kept_py = filter_points(pts4, np.zeros((len(pts), 3), np.float32),
                                  0.5)
    assert abs(len(kept_nat) - len(kept_py)) <= max(4, 0.03 * len(kept_py))
    inter = len(set(kept_nat.tolist()) & set(kept_py.tolist()))
    assert inter >= 0.9 * max(len(kept_py), 1)


def test_density_greedy_native_matches_python(rng):
    from meshrecon.meshing.native import density_greedy_native
    from meshrecon.points.filter import (
        build_half_edges, _power_iteration_host, _greedy_numpy, DENSITY_LIMIT,
    )

    pts = rng.normal(size=(300, 3)).astype(np.float32)
    n = len(pts)
    ei, ej, w = build_half_edges(pts, 0.6)
    srt = np.argsort(ei, kind="stable")
    ei, ej, w = ei[srt], ej[srt], w[srt]
    out = density_greedy_native(ei, ej, w, n, DENSITY_LIMIT, 60)
    if out is None:
        import pytest

        pytest.skip("native lib unavailable")
    kept_nat, dens_nat, _ = out
    dens_py, score_py = _power_iteration_host(ei, ej, w.astype(np.float64), n)
    np.testing.assert_allclose(dens_nat, dens_py, atol=2e-3)
    order = np.argsort(-dens_py, kind="stable").astype(np.int64)
    ptr = np.zeros(n + 1, np.int64)
    np.add.at(ptr, ei + 1, 1)
    ptr = np.cumsum(ptr)
    kept_py = _greedy_numpy(order, score_py.astype(np.float32),
                            dens_py, ptr, ej, w, DENSITY_LIMIT)
    inter = len(set(kept_nat.tolist()) & set(kept_py.tolist()))
    assert inter >= 0.95 * max(len(kept_py), 1)
