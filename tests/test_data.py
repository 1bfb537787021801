"""Data pipeline tests: the synthesized H must actually map source→target."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from gfnet_tpu.data.homography_synth import random_homography_pair  # noqa: E402


def _checkerboard(n=600, cell=24):
    yy, xx = np.mgrid[0:n, 0:n]
    base = (((yy // cell) + (xx // cell)) % 2).astype(np.float32)
    rgb = np.stack([base, 0.5 * base + 0.2, 1 - base], axis=-1)
    # add gradients so the pattern is not shift-ambiguous
    rgb[..., 0] += xx / n * 0.5
    rgb[..., 1] += yy / n * 0.5
    return np.clip(rgb, 0, 1)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_synth_h_warps_source_onto_target(seed):
    rng = np.random.default_rng(seed)
    img = _checkerboard()
    src, tgt, H = random_homography_pair(
        img, img.copy(), crop_size=320, input_hw=(224, 224), deformation_ratio=0.3,
        bi=True, rng=rng,
    )
    assert src.shape == (224, 224, 3) and tgt.shape == (224, 224, 3)
    # warp source by H_s2t -> should align with target where both are valid
    warped = cv2.warpPerspective(src, H, (224, 224))
    inner = (slice(40, 184), slice(40, 184))
    a = warped[inner].reshape(-1)
    b = tgt[inner].reshape(-1)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.8, corr
    # direction check: H maps source→target, so the reverse must be much worse
    rev = cv2.warpPerspective(tgt, H, (224, 224))
    corr_rev = np.corrcoef(rev[inner].reshape(-1), src[inner].reshape(-1))[0, 1]
    assert corr > corr_rev + 0.3


def test_synth_identity_when_not_bi_same_image():
    """bi=False leaves the target view un-deformed relative to its crop; the
    source is still warped, and H must compensate."""
    rng = np.random.default_rng(3)
    img = _checkerboard()
    src, tgt, H = random_homography_pair(
        img, img.copy(), crop_size=320, input_hw=(224, 224), deformation_ratio=0.3,
        bi=False, rng=rng,
    )
    warped = cv2.warpPerspective(src, H, (224, 224))
    inner = (slice(40, 184), slice(40, 184))
    corr = np.corrcoef(warped[inner].reshape(-1), tgt[inner].reshape(-1))[0, 1]
    assert corr > 0.8, corr


def test_synth_upscales_small_images():
    rng = np.random.default_rng(4)
    img = _checkerboard(200)
    src, tgt, H = random_homography_pair(
        img, img.copy(), crop_size=320, input_hw=(224, 224), rng=rng
    )
    assert src.shape == (224, 224, 3)
    assert np.all(np.isfinite(H))
