"""Golden test of RobustLoss against an independent torch transcription of
the reference loss math (`losses/robust_loss.py`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfnet_tpu.train.loss import RobustLoss, gt_warp_from_homography


def _rand_corresps(rng, scales, grids, itrs, b=2):
    out = {}
    for s, g in zip(scales, grids):
        out[s] = {}
        for i in range(1, itrs + 1):
            out[s][i] = {
                "flow": rng.uniform(-1, 1, (b, g, g, 2)).astype(np.float32),
                "certainty": rng.standard_normal((b, g, g, 1)).astype(np.float32),
            }
    return out


def _torch_reference_loss(corresps, H, src_h, tgt_h, *, ce_weight, alpha, c,
                          iteration_base, local_largest_scale, local_dist, im_size):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    def gt_warp(Ht, grid_h, grid_w):
        b = Ht.shape[0]
        ys = torch.linspace(-1 + 1 / grid_h, 1 - 1 / grid_h, grid_h)
        xs = torch.linspace(-1 + 1 / grid_w, 1 - 1 / grid_w, grid_w)
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        x1_n = torch.stack([gx, gy], dim=-1).reshape(1, -1, 2).expand(b, -1, 2)
        x1 = (x1_n + 1) * (src_h - 1) * 0.5
        ones = torch.ones_like(x1[..., :1])
        ph = torch.cat([x1, ones], dim=-1)
        x2h = torch.einsum("bij,bnj->bni", Ht, ph)
        x2 = x2h[..., :2] / x2h[..., 2:]
        x2n = (x2 / (tgt_h - 1)) * 2 - 1
        x2n = x2n.reshape(b, grid_h, grid_w, 2)
        mask = ((x2n < 1) & (x2n > -1)).sum(-1) == 2
        return x2n, mask.float()

    Ht = torch.from_numpy(H)
    tot = 0.0
    prev_epe = None
    for s_str, per_itr in corresps.items():
        scale = int(s_str)
        itrs = sorted(per_itr.keys())
        g = per_itr[itrs[0]]["flow"].shape[1]
        x2, prob = gt_warp(Ht, g, g)
        if local_largest_scale >= scale and prev_epe is not None:
            up = F.interpolate(prev_epe[:, None], size=(g, g), mode="nearest-exact")[:, 0]
            prob = prob * (up < (2 / im_size) * (local_dist[scale] * scale)).float()
        ce = 0.0
        reg = 0.0
        n = len(itrs)
        for i in itrs:
            flow = torch.from_numpy(per_itr[i]["flow"])
            cert = torch.from_numpy(per_itr[i]["certainty"])
            epe = (flow - x2).norm(dim=-1)
            ce = ce + iteration_base ** (n - i) * F.binary_cross_entropy_with_logits(
                cert[..., 0], prob
            )
            x = epe[prob > 0.99]
            cs = c * scale
            reg_v = iteration_base ** (n - i) * cs**alpha * ((x / cs) ** 2 + 1) ** (alpha / 2)
            reg = reg + (reg_v.mean() if x.numel() else torch.tensor(0.0))
            if i == n:
                prev_epe = epe.detach()
        tot = tot + ce_weight * ce + reg
    return float(tot)


def test_gt_warp_identity_center_in_bounds():
    H = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    x2, prob = gt_warp_from_homography(H, (448, 448), (448, 448), (8, 8))
    from gfnet_tpu.core.geometry import normalized_grid

    np.testing.assert_allclose(np.asarray(x2[0]), np.asarray(normalized_grid(8, 8)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob), 1.0)


def test_gt_warp_shift_out_of_bounds():
    H = np.eye(3, dtype=np.float32)
    H[0, 2] = 400.0  # shift x right by 400px -> right half out of bounds
    x2, prob = gt_warp_from_homography(jnp.asarray(H[None]), (448, 448), (448, 448), (8, 8))
    p = np.asarray(prob[0])
    assert p[:, -4:].sum() == 0
    assert p[:, 0].sum() == 8


@pytest.mark.parametrize("iteration_base,num_itr", [(1.0, 1), (0.85, 2)])
def test_loss_matches_torch_reference(iteration_base, num_itr):
    rng = np.random.default_rng(0)
    scales = ["16", "8", "4", "2", "1"]
    grids = [4, 4, 8, 16, 32]
    corresps = _rand_corresps(rng, scales, grids, num_itr)
    H = np.stack([np.eye(3, dtype=np.float32) + rng.normal(0, 0.01, (3, 3)).astype(np.float32) * np.float32(1)
                  for _ in range(2)])
    H[:, 2, :2] = 0  # keep well-conditioned
    kw = dict(
        ce_weight=0.01, alpha=0.5, c=1e-4, iteration_base=iteration_base,
        local_largest_scale=8, local_dist={1: 4, 2: 4, 4: 8, 8: 8}, im_size=448,
    )
    loss = RobustLoss(**kw)
    ours, metrics = loss(
        {s: {i: {k: jnp.asarray(v) for k, v in d.items()} for i, d in per.items()}
         for s, per in corresps.items()},
        jnp.asarray(H), (448, 448), (448, 448),
    )
    ref = _torch_reference_loss(corresps, H, 448, 448, **kw)
    assert float(ours) == pytest.approx(ref, rel=1e-4)
    assert "train_pck_05_scale_1" in metrics
