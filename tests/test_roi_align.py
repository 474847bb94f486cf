import numpy as np
import jax.numpy as jnp
import pytest

from cosypose_tpu.ops import roi_align, deepim_boxes


def test_roi_align_constant_image():
    img = jnp.ones((1, 3, 48, 64)) * 0.5
    boxes = jnp.asarray([[8.0, 8.0, 40.0, 32.0]])
    out = roi_align(img, boxes, output_size=(12, 16))
    assert out.shape == (1, 3, 12, 16)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


def test_roi_align_matches_torchvision():
    torchvision = pytest.importorskip("torchvision")
    import torch

    rng = np.random.RandomState(0)
    img = rng.uniform(size=(2, 3, 48, 64)).astype(np.float32)
    boxes = np.array(
        [[5.5, 3.2, 40.0, 30.7], [-4.0, 10.0, 70.0, 52.0]], dtype=np.float32
    )
    out = roi_align(jnp.asarray(img), jnp.asarray(boxes), output_size=(24, 32), sampling_ratio=4)

    tv_boxes = torch.cat(
        [torch.arange(2).unsqueeze(1).float(), torch.as_tensor(boxes)], dim=1
    )
    expected = torchvision.ops.roi_align(
        torch.as_tensor(img), tv_boxes, output_size=(24, 32), sampling_ratio=4
    ).numpy()
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_roi_align_gradient_ramp():
    # image with value = x coordinate; crop must reproduce the ramp scaled
    H, W = 32, 32
    xs = np.arange(W, dtype=np.float32)
    img = np.tile(xs[None, None, None, :], (1, 1, H, 1))
    boxes = jnp.asarray([[0.0, 0.0, 32.0, 32.0]])
    out = np.asarray(roi_align(jnp.asarray(img), boxes, output_size=(32, 32)))
    # center of output bin i samples around x = i + 0.5 → value ≈ i + 0.5 clipped
    interior = out[0, 0, 16, 8:24]
    np.testing.assert_allclose(interior, xs[8:24] + 0.5, atol=0.01)


def test_deepim_boxes_aspect_ratio():
    center = jnp.asarray([[[100.0, 100.0]]])
    obs = jnp.asarray([[80.0, 90.0, 120.0, 110.0]])
    rend = jnp.asarray([[85.0, 95.0, 115.0, 105.0]])
    boxes = np.asarray(deepim_boxes(center, obs, rend, im_size=(240, 320), lamb=1.4))
    w = boxes[0, 2] - boxes[0, 0]
    h = boxes[0, 3] - boxes[0, 1]
    np.testing.assert_allclose(w / h, 320.0 / 240.0, atol=1e-5)
    # centered on the projected center
    np.testing.assert_allclose((boxes[0, 0] + boxes[0, 2]) / 2, 100.0, atol=1e-5)
    # contains the union box inflated: xdist=20 → width = max(20, 10*4/3)*2*1.4 = 56
    np.testing.assert_allclose(w, 56.0, atol=1e-4)


def test_matmul_matches_gather_implementation():
    from cosypose_tpu.ops.roi_align import roi_align_gather

    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.uniform(size=(3, 3, 40, 56)).astype(np.float32))
    boxes = jnp.asarray(
        [[4.5, 3.2, 38.0, 30.7], [-6.0, 10.0, 60.0, 44.0], [0.0, 0.0, 56.0, 40.0]],
        jnp.float32,
    )
    a = roi_align(img, boxes, output_size=(16, 24), sampling_ratio=4)
    b = roi_align_gather(img, boxes, output_size=(16, 24), sampling_ratio=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
