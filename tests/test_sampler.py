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


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_patch_equals_base(align_corners):
    """The patch-slice lowering (TPU default) must match the 4-gather base
    exactly, including far out-of-range, exact-border, and non-finite points."""
    import functools

    import jax

    from gfnet_tpu.ops.sampler import _grid_sample_base, _grid_sample_patch

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.standard_normal((2, 40, 30, 6)).astype(np.float32))
    pts = rng.uniform(-1.8, 1.8, (2, 500, 2)).astype(np.float32)
    pts[0, :3] = [[np.nan, 0.0], [np.inf, 0.5], [-np.inf, -np.inf]]
    grid = jnp.asarray(pts)
    base = _grid_sample_base(img, grid, align_corners, "zeros")
    patch = _grid_sample_patch(img, grid, align_corners)
    # non-finite coords: base propagates NaN, patch/packed map them to the
    # zero margin — assert the guarded behavior, compare the rest exactly
    np.testing.assert_array_equal(np.asarray(patch)[0, :3], 0.0)
    np.testing.assert_allclose(
        np.asarray(patch)[:, 3:], np.asarray(base)[:, 3:], atol=0
    )
    ref = _torch_grid_sample(
        np.asarray(img), np.nan_to_num(pts[:, None], posinf=9.0, neginf=-9.0),
        align_corners, "zeros",
    )[:, 0]
    np.testing.assert_allclose(np.asarray(patch)[:, 3:], ref[:, 3:],
                               rtol=1e-4, atol=1e-5)

    def loss(fn, i, g):
        return jnp.sum(fn(i, g) ** 2)

    grid_fin = jnp.asarray(pts[:, 3:])  # finite-only for the grad check
    g_base = jax.grad(
        functools.partial(
            loss, lambda i, g: _grid_sample_base(i, g, align_corners, "zeros")
        )
    )(img, grid_fin)
    g_patch = jax.grad(
        functools.partial(
            loss, lambda i, g: _grid_sample_patch(i, g, align_corners)
        )
    )(img, grid_fin)
    np.testing.assert_allclose(np.asarray(g_patch), np.asarray(g_base),
                               rtol=1e-4, atol=1e-5)


def test_grid_sample_patch_bf16_matches_base():
    from gfnet_tpu.ops.sampler import _grid_sample_base, _grid_sample_patch

    rng = np.random.default_rng(8)
    img = jnp.asarray(
        rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    ).astype(jnp.bfloat16)
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 77, 2)).astype(np.float32))
    base = _grid_sample_base(img, grid, False, "zeros")
    patch = _grid_sample_patch(img, grid, False)
    assert patch.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(patch, np.float32), np.asarray(base, np.float32), atol=0
    )


def test_grid_sample_identity_grid_equals_input():
    """Sampling at the pixel-center grid reproduces the input exactly."""
    from gfnet_tpu.core.geometry import normalized_grid

    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    grid = np.asarray(normalized_grid(8, 8))[None]
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_packed_equals_base(align_corners):
    """The packed single-gather lowering must match the 4-gather base exactly,
    including far out-of-range and exact-border points (zeros padding)."""
    import functools

    import jax

    from gfnet_tpu.ops.sampler import _grid_sample_base, _grid_sample_packed

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((2, 40, 30, 6)).astype(np.float32))
    pts = rng.uniform(-1.8, 1.8, (2, 25, 25, 2)).astype(np.float32)
    # exact borders and corners
    pts[0, 0, :4] = [[-1, -1], [1, 1], [-1, 1], [1, -1]]
    grid = jnp.asarray(pts)

    packed = _grid_sample_packed(img, grid, align_corners)
    base = _grid_sample_base(img, grid, align_corners, "zeros")
    np.testing.assert_allclose(np.asarray(packed), np.asarray(base), atol=0)

    ref = _torch_grid_sample(np.asarray(img), pts, align_corners, "zeros")
    np.testing.assert_allclose(np.asarray(packed), ref, rtol=1e-4, atol=1e-5)

    # gradients of the two lowerings agree (w.r.t. image and grid)
    def loss(fn, i, g):
        return jnp.sum(fn(i, g) ** 2)

    gi_p, gg_p = jax.grad(
        functools.partial(loss, lambda i, g: _grid_sample_packed(i, g, align_corners)),
        (0, 1),
    )(img, grid)
    gi_b, gg_b = jax.grad(
        functools.partial(
            loss, lambda i, g: _grid_sample_base(i, g, align_corners, "zeros")
        ),
        (0, 1),
    )(img, grid)
    np.testing.assert_allclose(np.asarray(gi_p), np.asarray(gi_b), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gg_p), np.asarray(gg_b), rtol=1e-4, atol=2e-4)


def test_grid_sample_arbitrary_query_shape():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((3, 10, 10, 4)).astype(np.float32)
    grid = rng.uniform(-1, 1, (3, 50, 2)).astype(np.float32)
    out = grid_sample(jnp.asarray(img), jnp.asarray(grid))
    assert out.shape == (3, 50, 4)
    ref = _torch_grid_sample(img, grid[:, :, None, :], False, "zeros")[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_grid_sample_packed_equals_base_bf16():
    """bf16 images (the hot refiner warp path): both lowerings compute the
    bilinear weight products in f32 and cast at the final multiply, so the
    n*384 shape-heuristic dispatch never changes results."""
    from gfnet_tpu.ops.sampler import _grid_sample_base, _grid_sample_packed

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.standard_normal((2, 40, 30, 6)), jnp.bfloat16)
    pts = rng.uniform(-1.5, 1.5, (2, 25, 25, 2)).astype(np.float32)
    grid = jnp.asarray(pts)
    packed = _grid_sample_packed(img, grid, False)
    base = _grid_sample_base(img, grid, False, "zeros")
    assert packed.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(packed, np.float32), np.asarray(base, np.float32), atol=0
    )
