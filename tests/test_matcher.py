"""End-to-end matcher API tests on the tiny config (random weights).

Random weights can't produce accurate matches; these tests pin the machinery:
two-pass forward shapes, symmetric warp stitching (ref `network.py:373-378`),
threshold-balanced sampling semantics (ref `network.py:385-414`), and the
full match→sample→solve pipeline executing under jit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfnet_tpu.config import tiny_test_config
from gfnet_tpu.matcher.api import GFNetMatcher, upsample_grid_schedule


@pytest.fixture(scope="module")
def matcher():
    return GFNetMatcher(tiny_test_config(), dtype=jnp.float32)


def test_upsample_grid_schedule():
    assert upsample_grid_schedule((560, 560)) == (40, 80, 160, 320)
    assert upsample_grid_schedule((168, 168)) == (12, 24, 48, 96)


def test_match_shapes_symmetric(matcher):
    rng = np.random.default_rng(0)
    imA = rng.uniform(0, 1, (100, 120, 3)).astype(np.float32)
    imB = rng.uniform(0, 1, (90, 110, 3)).astype(np.float32)
    warp, cert = matcher.match(imA, imB)
    g = upsample_grid_schedule(matcher.cfg.upsample_res)[-1]
    assert warp.shape == (g, 2 * g, 4)
    assert cert.shape == (g, 2 * g)
    w = np.asarray(warp)
    c = np.asarray(cert)
    assert np.all(np.abs(w) <= 1 + 1e-6)
    assert np.all((c >= 0) & (c <= 1))
    # left half first two channels are the regular A grid
    from gfnet_tpu.core.geometry import normalized_grid

    grid = np.asarray(normalized_grid(g, g))
    np.testing.assert_allclose(w[:, :g, :2], grid, atol=1e-6)
    # right half last two channels are the regular B grid
    np.testing.assert_allclose(w[:, g:, 2:], grid, atol=1e-6)


def test_match_batched(matcher):
    rng = np.random.default_rng(1)
    imA = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    imB = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    warp, cert = matcher.match(imA, imB)
    assert warp.shape[0] == 2 and cert.shape[0] == 2


def test_sample_threshold_and_count(matcher):
    rng = np.random.default_rng(2)
    n = 4000
    matches = jnp.asarray(rng.uniform(-1, 1, (n, 4)).astype(np.float32))
    cert = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))
    m, c = matcher.sample(matches, cert, num=500, key=jax.random.PRNGKey(0))
    assert m.shape == (500, 4)
    assert c.shape == (500,)
    # thresholding: all certainties > 0.05 were promoted to exactly 1
    assert np.all((np.asarray(c) == 1.0) | (np.asarray(c) <= 0.05))


def test_sample_prefers_high_certainty(matcher):
    """Zero-certainty matches must never be sampled."""
    n = 2000
    rng = np.random.default_rng(3)
    matches = jnp.asarray(rng.uniform(-1, 1, (n, 4)).astype(np.float32))
    cert = jnp.zeros((n,))
    cert = cert.at[: n // 2].set(1.0)
    m, c = matcher.sample(matches, cert, num=200, key=jax.random.PRNGKey(1))
    assert np.all(np.asarray(c) > 0)


def test_estimate_homography_runs(matcher):
    rng = np.random.default_rng(4)
    imA = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    imB = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    H = matcher.estimate_homography(imA, imB, num_matches=300)
    assert H.shape == (3, 3)
    assert bool(jnp.all(jnp.isfinite(H)))
    assert float(H[2, 2]) == pytest.approx(1.0, abs=1e-5)


def test_estimate_homography_batched(matcher):
    """Batched serving path: (B,...) pairs → (B,3,3) in one sample+solve
    dispatch, consistent with the per-pair path given the same key."""
    rng = np.random.default_rng(6)
    imA = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    imB = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    Hs = matcher.estimate_homography_batched(imA, imB, num_matches=300)
    assert Hs.shape == (2, 3, 3)
    assert bool(jnp.all(jnp.isfinite(Hs)))
    np.testing.assert_allclose(np.asarray(Hs[:, 2, 2]), 1.0, atol=1e-5)
    # single-image input is auto-promoted to a batch of one
    H1 = matcher.estimate_homography_batched(imA[0], imB[0], num_matches=300)
    assert H1.shape == (1, 3, 3)


def test_batched_odd_batch_under_mesh(matcher):
    """B % mesh.size != 0 (B > mesh) serving: the batch is padded to a mesh
    multiple (repeating the last pair), runs genuinely sharded, and outputs
    are sliced back to B — same values as the unsharded path."""
    from gfnet_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(7)
    imA = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    imB = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    w_ref, c_ref = matcher.match(imA, imB)

    sharded = GFNetMatcher(
        matcher.cfg, matcher.vit_params, matcher.head_vars, dtype=jnp.float32
    )
    sharded.shard_for_mesh(create_mesh(2))
    assert sharded._pad_to_mesh(3) == 1
    w, c = sharded.match(imA, imB)
    assert w.shape == w_ref.shape and c.shape == c_ref.shape
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=2e-5)
    Hs = sharded.estimate_homography_batched(imA, imB, num_matches=300)
    assert Hs.shape == (3, 3, 3)
    assert bool(jnp.all(jnp.isfinite(Hs)))


def test_submesh_batch_uses_sharded_corr(matcher):
    """B < mesh serving (latency mode): no padding; the coarse correlation
    init runs grid-block-sharded over the mesh and must match the dense
    path's output."""
    from gfnet_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(8)
    imA = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    imB = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    w_ref, c_ref = matcher.match(imA, imB)

    sharded = GFNetMatcher(
        matcher.cfg, matcher.vit_params, matcher.head_vars, dtype=jnp.float32
    )
    mesh = create_mesh(8)
    sharded.shard_for_mesh(mesh)
    assert sharded._pad_to_mesh(1) == 0
    # symmetric pass1 has B'=2 < 8 and (coarse grid)^2 = 64 % 8 == 0
    assert sharded.head._use_sharded_corr((2, 8, 8, 16))
    w, c = sharded.match(imA, imB)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=2e-5)


def test_match_deterministic(matcher):
    rng = np.random.default_rng(5)
    imA = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    imB = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    w1, c1 = matcher.match(imA, imB)
    w2, c2 = matcher.match(imA, imB)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
