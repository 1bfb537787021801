"""Data pipeline tests: the synthesized H must actually map source→target."""

import os
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


def test_synth_valdir_roundtrip(tmp_path):
    """tools/make_synth_valdir.py writes the reference val layout; loading it
    through HomographyDataset returns the exact GT H and the images up to
    uint8 quantization — so cli/test.py evaluates against true homographies."""
    import subprocess
    import sys

    import numpy as np

    from gfnet_tpu.data.dataset import HomographyDataset
    from gfnet_tpu.eval.synthetic import eval_pairs

    r = subprocess.run(
        [sys.executable, "tools/make_synth_valdir.py", "--n", "3", "--res", "112",
         "--deformation", "0.3", "--out", str(tmp_path),
         "--name", "synth_1k_112x112"],
        capture_output=True, text=True,
        env={"PYTHONPATH": "/root/repo", "PATH": os.environ.get("PATH", ""),
             "JAX_PLATFORMS": "cpu"},
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    pairs = eval_pairs(3, 112, 0.3, seed=1234)
    ds = HomographyDataset(dataset="synthetic_tiny", mode="val",
                           data_path=str(tmp_path), input_resolution=(112, 112))
    assert len(ds) == 3
    for i in range(3):
        s = ds[i]
        np.testing.assert_allclose(
            s["H_s2t"] / s["H_s2t"][2, 2],
            pairs[i]["H_s2t"] / pairs[i]["H_s2t"][2, 2], atol=1e-6,
        )
        assert np.abs(s["im_A"] - pairs[i]["im_A"]).max() < 3 / 255
        assert np.abs(s["im_B"] - pairs[i]["im_B"]).max() < 3 / 255


def test_modality_shift_changes_appearance_not_geometry():
    import numpy as np

    from gfnet_tpu.eval.synthetic import make_texture, modality_shift

    rng = np.random.default_rng(0)
    tex = make_texture(rng, 64)
    shifted = modality_shift(tex, rng)
    assert shifted.shape == tex.shape
    assert shifted.dtype == np.float32
    assert float(np.abs(shifted - tex).mean()) > 0.02  # real appearance gap
    assert shifted.min() >= 0.0 and shifted.max() <= 1.0
