"""COLMAP sparse-model IO: bin/txt roundtrip + cross-format equivalence
(capability match for the reference's vendored colmap_read_write_model.py)."""

import numpy as np

from cosypose_tpu.utils.colmap_io import (
    Camera, Image, Point3D, read_model, write_model,
)


def _toy_model():
    cameras = {
        1: Camera(1, "PINHOLE", 640, 480,
                  np.array([600.0, 600.0, 320.0, 240.0])),
        2: Camera(2, "SIMPLE_RADIAL", 320, 240,
                  np.array([300.0, 160.0, 120.0, 0.01])),
    }
    rng = np.random.RandomState(0)
    images = {}
    for i in (1, 2, 3):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        n_pts = rng.randint(0, 5)
        images[i] = Image(
            i, q, rng.normal(size=3), 1 + i % 2, f"im_{i}.png",
            rng.uniform(0, 640, (n_pts, 2)),
            rng.randint(-1, 50, n_pts).astype(np.int64),
        )
    points = {
        7: Point3D(7, rng.normal(size=3), np.array([10, 200, 30]), 0.5,
                   np.array([1, 2]), np.array([0, 1])),
        9: Point3D(9, rng.normal(size=3), np.array([0, 0, 255]), 1.25,
                   np.array([3]), np.array([0])),
    }
    return cameras, images, points


def _assert_equal(a, b):
    cams_a, ims_a, pts_a = a
    cams_b, ims_b, pts_b = b
    assert cams_a.keys() == cams_b.keys()
    for k in cams_a:
        assert cams_a[k].model == cams_b[k].model
        np.testing.assert_allclose(cams_a[k].params, cams_b[k].params)
    assert ims_a.keys() == ims_b.keys()
    for k in ims_a:
        np.testing.assert_allclose(ims_a[k].qvec, ims_b[k].qvec)
        np.testing.assert_allclose(ims_a[k].tvec, ims_b[k].tvec)
        assert ims_a[k].name == ims_b[k].name
        np.testing.assert_allclose(ims_a[k].xys, ims_b[k].xys)
        np.testing.assert_array_equal(ims_a[k].point3D_ids,
                                      ims_b[k].point3D_ids)
    assert pts_a.keys() == pts_b.keys()
    for k in pts_a:
        np.testing.assert_allclose(pts_a[k].xyz, pts_b[k].xyz)
        np.testing.assert_array_equal(pts_a[k].image_ids, pts_b[k].image_ids)


def test_bin_and_txt_roundtrip(tmp_path):
    model = _toy_model()
    write_model(*model, tmp_path / "bin", ext=".bin")
    got_bin = read_model(tmp_path / "bin")
    _assert_equal(model, got_bin)

    write_model(*model, tmp_path / "txt", ext=".txt")
    got_txt = read_model(tmp_path / "txt")
    _assert_equal(model, got_txt)
    _assert_equal(got_bin, got_txt)


def test_qvec2rotmat_orthonormal():
    _, images, _ = _toy_model()
    for im in images.values():
        R = im.qvec2rotmat()
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert np.linalg.det(R) > 0.99
