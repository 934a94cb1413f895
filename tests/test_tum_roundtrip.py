"""End-to-end TUM ingest validation on a real on-disk sequence directory.

The reference's integration test is `dvo_benchmark` over a TUM directory
(benchmark_slam.cpp:448-525).  No TUM data ships here (zero egress), so
utils/synthetic_tum.py writes a REAL TUM-layout directory (PNG rgb/depth,
assoc.txt, groundtruth.txt) from the procedural renderer and these tests
drive the full ingest path — PNG decode (native C++ / cv2), BT.601 gray,
u16/5000 depth, association, CLI, ATE vs groundtruth — through it.
"""

import json
import os

import numpy as np
import pytest

from dvo_slam_tpu.utils import synthetic
from dvo_slam_tpu.utils.dataset import TumDataset
from dvo_slam_tpu.utils.synthetic_tum import write_tum_sequence

cv2 = pytest.importorskip("cv2")

SHAPE = (60, 80)


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tum_seq") / "rgbd_dataset_synth")
    write_tum_sequence(root, num_frames=10, shape=SHAPE, seed=3)
    return root


def test_tum_directory_roundtrip(tum_dir):
    """Loaded frames must match the renderer output up to PNG/u16
    quantization (gray exactly: r=g=b survives BT.601)."""
    ds = TumDataset(tum_dir)
    assert len(ds) == 10
    k = ds.intrinsics  # from intrinsics.txt
    poses = synthetic.circular_trajectory(10, radius=0.05, rot_amplitude=0.02)
    f = ds[4]
    intensity, depth, valid = synthetic.render_frame(poses[4], k, SHAPE, seed=3 + 4)
    assert np.abs(f.intensity - np.clip(np.rint(intensity), 0, 255)).max() <= 1.0
    assert np.array_equal(f.valid, valid & (np.rint(depth * 5000) > 0))
    assert np.abs(f.depth[f.valid] - depth[f.valid]).max() <= 1.01 / 5000.0
    assert f.timestamp == pytest.approx(4 / 30.0, abs=1e-5)  # 6-decimal stamps


def test_tum_association_fallback(tmp_path):
    """Without assoc.txt the loader associates rgb.txt/depth.txt by
    nearest timestamp (the associate.py behavior the reference assumes)."""
    root = str(tmp_path / "noassoc")
    write_tum_sequence(root, num_frames=5, shape=SHAPE, write_assoc=False)
    ds = TumDataset(root)
    assert len(ds) == 5
    assert ds[0].intensity.shape == SHAPE


def test_cli_odometry_on_tum_directory(tum_dir, tmp_path, capsys):
    """The batch driver consumes the on-disk sequence and lands within the
    ATE gate vs the written groundtruth.txt — the full reference loop
    (load -> track -> TUM trajectory out -> ATE) on real files."""
    from dvo_slam_tpu.cli.benchmark import main

    rc = main([
        "--dataset", tum_dir,
        "--mode", "odometry",
        "--output-dir", str(tmp_path),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["frames"] == 10
    assert report["ate_rmse_m"] < 0.010, report
    traj = (tmp_path / "trajectory.txt").read_text().strip().splitlines()
    assert len(traj) == 10 and len(traj[0].split()) == 8  # TUM format
