"""Trajectory IO / metric tests."""

import numpy as np
import jax.numpy as jnp

from dvo_slam_tpu.ops import se3
from dvo_slam_tpu.utils import trajectory


def _random_poses(n, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    return np.asarray(
        se3.exp_se3(jnp.asarray(rng.normal(0, scale, (n, 6)))), np.float64
    )


def test_quaternion_roundtrip():
    for T in _random_poses(20, seed=1):
        q = trajectory.rotation_to_quaternion(T[:3, :3])
        R = trajectory.quaternion_to_rotation(q)
        np.testing.assert_allclose(R, T[:3, :3], atol=1e-6)


def test_write_read_roundtrip(tmp_path):
    poses = _random_poses(10, seed=2)
    stamps = np.arange(10) * 0.1
    path = tmp_path / "traj.txt"
    trajectory.write_tum_trajectory(path, stamps, poses)
    rs, rp = trajectory.read_tum_trajectory(path)
    np.testing.assert_allclose(rs, stamps, atol=1e-6)
    np.testing.assert_allclose(rp, poses, atol=1e-6)


def test_ate_zero_for_identical():
    poses = _random_poses(30, seed=3)
    stamps = np.arange(30) * 0.1
    assert trajectory.ate_rmse(stamps, poses, stamps, poses) < 1e-9


def test_ate_invariant_to_rigid_offset():
    poses = _random_poses(30, seed=4)
    stamps = np.arange(30) * 0.1
    offset = _random_poses(1, seed=5)[0]
    moved = np.einsum("ij,njk->nik", offset, poses)
    assert trajectory.ate_rmse(stamps, moved, stamps, poses) < 1e-6


def test_ate_detects_error():
    poses = _random_poses(30, seed=6, scale=0.2)
    stamps = np.arange(30) * 0.1
    noisy = poses.copy()
    noisy[:, :3, 3] += np.random.default_rng(7).normal(0, 0.05, (30, 3))
    err = trajectory.ate_rmse(stamps, noisy, stamps, poses)
    assert 0.01 < err < 0.2


def test_rpe():
    poses = _random_poses(20, seed=8, scale=0.2)
    stamps = np.arange(20) * 0.1
    t_err, r_err = trajectory.rpe_rmse(stamps, poses, stamps, poses)
    assert t_err < 1e-9 and r_err < 1e-6


def test_association_with_offset_timestamps():
    stamps_a = np.arange(10) * 0.1
    stamps_b = stamps_a + 0.004
    ia, ib = trajectory.associate_trajectories(stamps_a, stamps_b)
    assert len(ia) == 10
    np.testing.assert_array_equal(ia, ib)
