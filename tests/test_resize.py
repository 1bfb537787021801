"""Golden tests: ops.resize vs torch.nn.functional.interpolate."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from gfnet_tpu.ops.resize import interpolate  # noqa: E402


def _torch_resize(x_nhwc, size, mode, align_corners=None, scale_factor=None):
    t = torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)
    kw = {}
    if mode in ("bilinear", "bicubic"):
        kw["align_corners"] = bool(align_corners)
    if scale_factor is not None:
        out = F.interpolate(t, scale_factor=scale_factor, mode=mode, **kw)
    else:
        out = F.interpolate(t, size=size, mode=mode, **kw)
    return out.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((14, 14), (32, 32)), ((56, 56), (32, 32)), ((13, 17), (29, 31)), ((8, 8), (8, 8))],
)
def test_resize_matches_torch(mode, align_corners, in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    ours = np.asarray(interpolate(jnp.asarray(x), out_hw, mode, align_corners))
    ref = _torch_resize(x, out_hw, mode, align_corners)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_nearest_exact_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 32, 32, 1)).astype(np.float32)
    ours = np.asarray(interpolate(jnp.asarray(x), (56, 56), "nearest-exact"))
    ref = _torch_resize(x, (56, 56), "nearest-exact")
    np.testing.assert_allclose(ours, ref)
    ours = np.asarray(interpolate(jnp.asarray(x), (7, 9), "nearest-exact"))
    ref = _torch_resize(x, (7, 9), "nearest-exact")
    np.testing.assert_allclose(ours, ref)


def test_bicubic_explicit_scale_factor_matches_torch():
    """The DINOv2 pos-embed path passes scale_factor=(w0+0.1)/sqrt(N)
    (ref `model/transformer/dinov2.py:180-186`)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 37, 37, 8)).astype(np.float32)
    sf = ((32 + 0.1) / 37, (32 + 0.1) / 37)
    ref = _torch_resize(x, None, "bicubic", False, scale_factor=sf)
    assert ref.shape[1:3] == (32, 32)
    ours = np.asarray(
        interpolate(jnp.asarray(x), (32, 32), "bicubic", False, scale=sf)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((672, 672), (448, 448)), ((140, 140), (112, 112)), ((33, 50), (21, 13)),
     ((448, 448), (560, 560))],
)
def test_antialias_resize_matches_torch(mode, in_hw, out_hw):
    """torchvision Resize tensor semantics (antialias=None ≡ True, the
    reference eval preprocessing `utils/utils.py:90`): PIL-style stretched
    kernel on downscale, a=-0.5 bicubic on upscale."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = (
        F.interpolate(xt, out_hw, mode=mode, align_corners=False, antialias=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    ours = np.asarray(interpolate(jnp.asarray(x), out_hw, mode, False, antialias=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)
