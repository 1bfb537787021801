"""Tests for global/local correlation and KDE against reference semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfnet_tpu.ops.correlation import corr_volume_flow, global_correlation, softmax_pos_embed
from gfnet_tpu.ops.kde import kde
from gfnet_tpu.ops.local_correlation import local_correlation, window_offsets


def test_global_correlation_values():
    rng = np.random.default_rng(0)
    f0 = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    f1 = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    corr = np.asarray(global_correlation(jnp.asarray(f0), jnp.asarray(f1)))
    # manual: corr[b, j, i] = <f1[j], f0[i]> / sqrt(C)
    f0f = f0.reshape(2, 16, 8)
    f1f = f1.reshape(2, 16, 8)
    exp = np.einsum("bjc,bic->bji", f1f, f0f) / np.sqrt(8)
    np.testing.assert_allclose(corr, exp, rtol=1e-4, atol=1e-5)


def test_softmax_pos_embed_peaked_corr_recovers_argmax_coord():
    """With a very peaked correlation, flow ≈ target cell coordinate."""
    g = 4
    corr = np.full((1, g * g, g * g), -50.0, np.float32)
    # query cell i matches target cell (i + 1) % 16
    for i in range(g * g):
        corr[0, (i + 1) % (g * g), i] = 50.0
    flow = np.asarray(softmax_pos_embed(jnp.asarray(corr), g, g)).reshape(g * g, 2)
    from gfnet_tpu.core.geometry import normalized_grid

    grid = np.asarray(normalized_grid(g, g)).reshape(g * g, 2)
    exp = grid[(np.arange(g * g) + 1) % (g * g)]
    np.testing.assert_allclose(flow, exp, atol=1e-4)


def test_corr_volume_flow_shape():
    rng = np.random.default_rng(1)
    f0 = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    flow = corr_volume_flow(f0, f1)
    assert flow.shape == (2, 8, 8, 2)
    assert np.all(np.abs(np.asarray(flow)) <= 1.0)


def _local_corr_torch_reference(query, target, flow, radius):
    """Direct port of utils/local_correlation.py:4-72 math (NCHW torch)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    b, g, _, c = query.shape
    _, h, w, _ = target.shape
    r = radius
    q = torch.from_numpy(query).permute(0, 3, 1, 2)
    t = torch.from_numpy(target).permute(0, 3, 1, 2)
    fl = torch.from_numpy(flow)
    oy = torch.linspace(-2 * r / h, 2 * r / h, 2 * r + 1)
    ox = torch.linspace(-2 * r / w, 2 * r / w, 2 * r + 1)
    wy, wx = torch.meshgrid(oy, ox, indexing="ij")
    win = torch.stack((wx, wy), dim=-1).reshape(1, (2 * r + 1) ** 2, 2)
    out = torch.empty((b, (2 * r + 1) ** 2, g, g))
    for i in range(b):
        coords = (fl[i][:, :, None] + win[:, None, None]).reshape(
            1, g, g * (2 * r + 1) ** 2, 2
        )
        wf = F.grid_sample(t[i : i + 1], coords, padding_mode="zeros", align_corners=False)
        wf = wf.reshape(c, g, g, (2 * r + 1) ** 2)
        out[i] = (q[i][..., None] / c**0.5 * wf).sum(dim=0).permute(2, 0, 1)
    return out.permute(0, 2, 3, 1).numpy()  # (B, G, G, K)


@pytest.mark.parametrize("radius,g,h", [(2, 8, 8), (3, 8, 14), (1, 4, 6)])
def test_local_correlation_matches_reference(radius, g, h):
    rng = np.random.default_rng(2)
    c = 8
    query = rng.standard_normal((2, g, g, c)).astype(np.float32)
    target = rng.standard_normal((2, h, h, c)).astype(np.float32)
    flow = rng.uniform(-1.1, 1.1, (2, g, g, 2)).astype(np.float32)
    ours = np.asarray(
        local_correlation(
            jnp.asarray(query), jnp.asarray(target), jnp.asarray(flow), radius, impl="gather"
        )
    )
    ref = _local_corr_torch_reference(query, target, flow, radius)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_local_correlation_chunked_equals_unchunked():
    from gfnet_tpu.ops.local_correlation import _local_correlation_gather

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((1, 6, 6, 4)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((1, 9, 9, 4)).astype(np.float32))
    f = jnp.asarray(rng.uniform(-1, 1, (1, 6, 6, 2)).astype(np.float32))
    a = _local_correlation_gather(q, t, f, 3, chunk=5)
    b = _local_correlation_gather(q, t, f, 3, chunk=1000)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_window_offsets_layout():
    offs = window_offsets(1, 10, 20)
    assert offs.shape == (9, 2)
    # row-major in y: first three share min y-offset
    np.testing.assert_allclose(offs[:3, 1], [-0.2, -0.2, -0.2], atol=1e-6)
    np.testing.assert_allclose(offs[::3, 0], [-0.1, -0.1, -0.1], atol=1e-6)


def test_kde_matches_torch_cdist():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, (500, 4)).astype(np.float32)
    std = 0.1
    t = torch.from_numpy(x)
    ref = (-torch.cdist(t, t) ** 2 / (2 * std**2)).exp().sum(dim=-1).numpy()
    ours = np.asarray(kde(jnp.asarray(x), std=std, block=128))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("radius,g,h", [(2, 8, 8), (3, 8, 14), (1, 4, 6)])
def test_local_correlation_patch_matches_reference(radius, g, h):
    from gfnet_tpu.ops.local_correlation import _local_correlation_patch

    rng = np.random.default_rng(7)
    c = 8
    query = rng.standard_normal((2, g, g, c)).astype(np.float32)
    target = rng.standard_normal((2, h, h, c)).astype(np.float32)
    flow = rng.uniform(-1.4, 1.4, (2, g, g, 2)).astype(np.float32)
    ours = np.asarray(
        _local_correlation_patch(jnp.asarray(query), jnp.asarray(target), jnp.asarray(flow), radius)
    )
    ref = _local_corr_torch_reference(query, target, flow, radius)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_local_correlation_patch_grad_flows_to_query():
    from gfnet_tpu.ops.local_correlation import _local_correlation_patch, _local_correlation_gather
    import jax

    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.standard_normal((1, 6, 6, 4)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((1, 9, 9, 4)).astype(np.float32))
    f = jnp.asarray(rng.uniform(-1, 1, (1, 6, 6, 2)).astype(np.float32))
    gp = jax.grad(lambda qq: jnp.sum(jnp.sin(_local_correlation_patch(qq, t, f, 2))))(q)
    gg = jax.grad(lambda qq: jnp.sum(jnp.sin(_local_correlation_gather(qq, t, f, 2))))(q)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gg), rtol=1e-4, atol=1e-4)


def test_corr_volume_flow_sharded_matches_dense():
    """Grid-block sharding over the 8-device mesh (SURVEY §5 scaling story):
    the flash-style distributed softmax expectation must equal the dense
    fused op elementwise."""
    import jax

    from gfnet_tpu.ops.correlation import corr_volume_flow, corr_volume_flow_sharded
    from gfnet_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(11)
    f0 = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32) * 3)
    f1 = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32) * 3)
    dense = corr_volume_flow(f0, f1)
    mesh = create_mesh(8)
    sharded = corr_volume_flow_sharded(f0, f1, mesh)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(dense), atol=1e-5, rtol=0
    )
    # per-device slice of the target features really is N1/8
    f1_flat = f1.reshape(2, 64, 16)
    from jax.sharding import NamedSharding, PartitionSpec as P

    placed = jax.device_put(f1_flat, NamedSharding(mesh, P(None, "data", None)))
    assert placed.addressable_shards[0].data.shape == (2, 8, 16)
