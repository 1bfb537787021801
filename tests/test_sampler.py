"""Golden tests: ops.sampler.grid_sample vs torch.nn.functional.grid_sample.

align_corners=False + zero padding border semantics are the reference's hot
convention (`model/network.py:537,547`, `utils/local_correlation.py:56-58`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from gfnet_tpu.ops.sampler import grid_sample  # noqa: E402


def _torch_grid_sample(img_nhwc, grid, align_corners, padding_mode):
    t = torch.from_numpy(np.asarray(img_nhwc)).permute(0, 3, 1, 2)
    g = torch.from_numpy(np.asarray(grid))
    out = F.grid_sample(
        t, g, mode="bilinear", padding_mode=padding_mode, align_corners=align_corners
    )
    return out.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_random(align_corners, padding_mode):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 12, 17, 5)).astype(np.float32)
    # include far out-of-range points to hit the padding path
    grid = rng.uniform(-1.6, 1.6, (2, 9, 11, 2)).astype(np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners, padding_mode))
    ref = _torch_grid_sample(img, grid, align_corners, padding_mode)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_grid_sample_identity_grid_equals_input():
    """Sampling at the pixel-center grid reproduces the input exactly."""
    from gfnet_tpu.core.geometry import normalized_grid

    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    grid = np.asarray(normalized_grid(8, 8))[None]
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_grid_sample_arbitrary_query_shape():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((3, 10, 10, 4)).astype(np.float32)
    grid = rng.uniform(-1, 1, (3, 50, 2)).astype(np.float32)
    out = grid_sample(jnp.asarray(img), jnp.asarray(grid))
    assert out.shape == (3, 50, 4)
    ref = _torch_grid_sample(img, grid[:, :, None, :], False, "zeros")[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
