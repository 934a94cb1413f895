"""Native C++ ingest tests: decode parity vs cv2, prefetcher, TUM dataset."""

import os

import numpy as np
import pytest

from dvo_slam_tpu import native

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def png_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    depth = rng.integers(0, 20000, (48, 64), dtype=np.uint16)
    depth[0, :5] = 0
    cv2.imwrite(str(d / "rgb.png"), rgb[..., ::-1])
    cv2.imwrite(str(d / "depth.png"), depth)
    return str(d / "rgb.png"), str(d / "depth.png"), rgb, depth


@pytest.mark.skipif(not native.native_available(), reason="no native toolchain")
def test_native_decode_matches_cv2(png_pair):
    rgb_path, depth_path, rgb, depth = png_pair
    gray, dep, valid = native.load_rgbd_native(rgb_path, depth_path)
    ref_gray = cv2.cvtColor(rgb[..., ::-1], cv2.COLOR_BGR2GRAY).astype(np.float32)
    assert np.abs(gray - ref_gray).max() <= 1.0  # +-1 LSB rounding
    np.testing.assert_array_equal(valid, depth > 0)
    np.testing.assert_allclose(dep[valid], depth[valid] / 5000.0, rtol=1e-6)
    assert (dep[~valid] == 0).all()


@pytest.mark.skipif(not native.native_available(), reason="no native toolchain")
def test_native_raw_formats(png_pair):
    rgb_path, depth_path, _, depth = png_pair
    g8, d16 = native.load_rgbd_raw(rgb_path, depth_path)
    assert g8.dtype == np.uint8 and d16.dtype == np.uint16
    np.testing.assert_array_equal(d16, depth)


@pytest.mark.skipif(not native.native_available(), reason="no native toolchain")
def test_prefetcher_order_and_content(png_pair):
    rgb_path, depth_path, _, depth = png_pair
    pf = native.RgbdFramePrefetcher(
        [(rgb_path, depth_path)] * 7, depth=3, workers=2, raw=True
    )
    frames = list(pf)
    pf.close()
    assert len(frames) == 7
    for g8, d16 in frames:
        np.testing.assert_array_equal(d16, depth)


@pytest.mark.skipif(not native.native_available(), reason="no native toolchain")
def test_native_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png at all")
    with pytest.raises(Exception):
        native.load_rgbd_native(str(bad), str(bad))


def test_tum_dataset_with_assoc(tmp_path, png_pair):
    rgb_path, depth_path, _, depth = png_pair
    import shutil

    root = tmp_path / "seq_freiburg1_test"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    shutil.copy(rgb_path, root / "rgb" / "0.png")
    shutil.copy(depth_path, root / "depth" / "0.png")
    (root / "assoc.txt").write_text("1.0 rgb/0.png 1.001 depth/0.png\n")

    from dvo_slam_tpu.utils.dataset import TumDataset

    ds = TumDataset(str(root))
    assert len(ds) == 1
    frame = ds[0]
    assert frame.intensity.shape == (48, 64)
    assert frame.timestamp == 1.0
    assert (frame.depth[~frame.valid] == 0).all()


def test_native_reduce_ingest_matches_numpy_oracle():
    """The C++ ingest reducer must be bit-identical to the NumPy form of
    streaming.host_reduce_ingest (which is itself bit-identical to the
    device pyramid path — test_host_reduced_ingest_is_bit_exact)."""
    import numpy as np
    import pytest

    from dvo_slam_tpu import native

    if not native.native_available():
        pytest.skip("native extension unavailable")
    rng = np.random.default_rng(3)
    iu = rng.integers(0, 256, (7, 96, 128), dtype=np.uint8)
    du = rng.integers(0, 60000, (7, 96, 128), dtype=np.uint16)
    for levels in (1, 2, 3):
        a_i, a_d = native.reduce_ingest_native(iu, du, levels)
        b_i = iu.astype(np.uint16)
        b_d = du
        for _ in range(levels):
            b_i = (
                b_i[..., 0::2, 0::2] + b_i[..., 0::2, 1::2]
                + b_i[..., 1::2, 0::2] + b_i[..., 1::2, 1::2]
            )
            b_d = b_d[..., 0::2, 0::2]
        np.testing.assert_array_equal(a_i, b_i)
        np.testing.assert_array_equal(a_d, b_d)
