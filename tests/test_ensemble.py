"""Seed-ensemble reconstruction (--ensemble-seeds).

Per-run quality tracks the randomized camera draw (the reference's
unseeded cv::randu, heuristic.cpp:365, has the same variance by
construction); the ensemble refines the cloud under several independent
draws and meshes the union once.
"""

import os

import numpy as np
import pytest

from meshrecon.io.tracks import load_tracks
from meshrecon.io.synthetic import synthetic_frames, fit_sphere
from meshrecon.pipeline.config import Config, build_parser
from meshrecon.pipeline.reconstruct import reconstruct


@pytest.fixture(scope="module")
def koule_small():
    track = load_tracks("tracks/koule-tr.yaml")
    frames = synthetic_frames(track, 80, 60, mode="sphere", seed=0)
    return track, frames


def _sphere_err(mesh, track):
    center, radius = fit_sphere(track.bundles)
    v3 = mesh.vertices[:, :3] / mesh.vertices[:, 3:4]
    return np.abs(np.linalg.norm(v3 - center, axis=1) - radius) / radius


def test_ensemble_seeds_cli_parsing():
    args = build_parser().parse_args(["x.yaml", "--ensemble-seeds", "3,4,5"])
    seeds = tuple(int(s) for s in args.ensemble_seeds.split(","))
    assert seeds == (3, 4, 5)


def test_ensemble_union_meets_trimmed_bound(koule_small, tmp_path):
    """2-seed ensemble at the trimmed e2e config: the union mesh must hold
    the single-seed trimmed regression bound (med<0.05, p90<0.20) — the
    merge may not degrade quality — and both seeds' checkpoints land in
    per-seed subdirectories."""
    track, frames = koule_small
    out = str(tmp_path / "ens.obj")
    cfg = Config(
        track=track,
        frames=frames,
        iteration_count=1,
        out_file_name=out,
        seed=3,
        ensemble_seeds=(3, 4),
        poisson_grid=64,
        depth_mode="hybrid",
        poisson_trim=2.0,
        checkpoint_dir=str(tmp_path / "ck"),
        verbosity=0,
    )
    mesh = reconstruct(cfg)
    assert os.path.exists(out)
    assert len(mesh.faces) > 50
    err = _sphere_err(mesh, track)
    assert np.median(err) < 0.05, f"median rel err {np.median(err)}"
    assert np.percentile(err, 90) < 0.20, f"p90 {np.percentile(err, 90)}"
    assert os.path.isdir(str(tmp_path / "ck" / "seed3"))
    assert os.path.isdir(str(tmp_path / "ck" / "seed4"))


def test_ensemble_sharded_matches_sequential(koule_small, tmp_path):
    """--scene-devices > 1 runs the seeds one-per-device through the
    scene-sharded fused step; the union mesh must closely agree with the
    sequential ensemble (same seeds)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2+ devices")
    track, frames = koule_small
    base = dict(track=track, frames=frames, iteration_count=1, seed=3,
                ensemble_seeds=(3, 4), poisson_grid=64, depth_mode="hybrid",
                poisson_trim=2.0)
    m_seq = reconstruct(Config(out_file_name=str(tmp_path / "seq.obj"),
                               **base))
    m_shd = reconstruct(Config(out_file_name=str(tmp_path / "shd.obj"),
                               scene_devices=2, **base))
    err = _sphere_err(m_shd, track)
    assert np.median(err) < 0.05
    v1 = m_seq.vertices[:, :3] / m_seq.vertices[:, 3:4]
    v2 = m_shd.vertices[:, :3] / m_shd.vertices[:, 3:4]
    assert np.linalg.norm(v1.mean(axis=0) - v2.mean(axis=0)) < 0.2


def test_multi_scene_sharded_ensemble(koule_small, tmp_path):
    """Several scenes x several seeds through the sharded multi-scene
    driver: each scene gets its own union mesh at its own output path."""
    import jax

    from meshrecon.pipeline.reconstruct import reconstruct_scenes

    if len(jax.devices()) < 2:
        pytest.skip("needs 2+ devices")
    track, frames = koule_small
    cfgs = [
        Config(track=track, frames=frames, iteration_count=1, seed=3,
               ensemble_seeds=(3, 4), poisson_grid=48, depth_mode="hybrid",
               poisson_trim=2.0,
               out_file_name=str(tmp_path / f"sc{i}.obj"))
        for i in range(2)
    ]
    meshes = reconstruct_scenes(cfgs, scene_devices=2)
    assert len(meshes) == 2
    for i, m in enumerate(meshes):
        assert len(m.faces) > 50
        assert os.path.exists(str(tmp_path / f"sc{i}.obj"))
        assert np.median(_sphere_err(m, track)) < 0.06
