"""Day-one checkpoint transfer: reference-format `.pth` → CLI → matcher.

Users of the reference arrive with `ckpts/*/latest.pth` files written by
`checkpointing/checkpoint.py:16-34` (a dict with "model"/"n"/"optimizer"/
"lr_scheduler") plus the DINOv2 backbone `.pth`. These tests write exactly
that artifact from the (randomized, tiny) imported reference model and drive
it through the full user path — `utils/convert.load_head_checkpoint`,
`tools/convert_dinov2`-format npz, and `cli/test.py --ckpt_path` — asserting
the loaded engine is bit-identical to the in-memory conversion that the
parity suite already validates elementwise against the reference.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")
from PIL import Image  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gfnet_tpu.config import ModelConfig  # noqa: E402
from gfnet_tpu.matcher.api import GFNetMatcher  # noqa: E402
from gfnet_tpu.utils.convert import (  # noqa: E402
    convert_dinov2_state_dict,
    convert_gfnet_head_state_dict,
    load_head_checkpoint,
)
from reference_harness import build_reference_gfnet, small_conf  # noqa: E402


def _model_config(conf: dict) -> ModelConfig:
    base = ModelConfig.from_dict(conf)
    dino = dataclasses.replace(
        base.dino, d_model=48, depth=2, num_heads=2, patch_size=14, pos_embed_size=37
    )
    return base.replace(
        dino=dino,
        initial_res=(112, 112),
        upsample_res=(168, 168),
        symmetric=True,
        upsample_preds=True,
        attenuate_cert=True,
    )


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Reference model + the exact on-disk artifacts a user would bring."""
    root = tmp_path_factory.mktemp("ckpts")
    conf = small_conf()
    conf["matcher"]["num_itr"] = [1, 1, 1, 1, 1]
    ref = build_reference_gfnet(conf, seed=0)

    # head checkpoint: the reference trainer's exact save structure
    # (`checkpointing/checkpoint.py:28`)
    pth = str(root / "latest.pth")
    torch.save(
        {
            "model": ref.state_dict(),
            "n": 12345,
            "optimizer": {"state": {}, "param_groups": []},
            "lr_scheduler": {"last_epoch": 3},
        },
        pth,
    )

    # backbone: tools/convert_dinov2.py output format
    vit_tree = convert_dinov2_state_dict(
        {k: v.numpy() for k, v in ref.dino[0].state_dict().items()}
    )
    flat = {}

    def walk(d, prefix=""):
        for k, v in d.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, path)
            else:
                flat[path] = np.asarray(v)

    walk(vit_tree)
    npz = str(root / "dinov2_tiny.npz")
    np.savez(npz, **flat)

    # extended-schema config JSON expressing the tiny architecture
    conf_json = dict(conf)
    conf_json["dino_cfg"] = dict(
        conf["dino_cfg"], depth=2, num_heads=2, patch_size=14, pos_embed_size=37
    )
    conf_json["initial_res"] = [112, 112]
    conf_json["upsample_res"] = [168, 168]
    conf_path = str(root / "tiny.json")
    with open(conf_path, "w") as f:
        json.dump(conf_json, f)
    return ref, conf, pth, npz, conf_path


def _assert_tree_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _assert_tree_equal(a[k], b[k], path + "/" + k)
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                err_msg=path + "/" + k,
            )


def test_pth_loads_bit_exact(artifacts):
    """torch.save'd reference checkpoint → load_head_checkpoint ==
    the in-memory conversion, leaf for leaf."""
    ref, conf, pth, _, _ = artifacts
    matcher = GFNetMatcher(_model_config(conf), dtype=jnp.float32)
    loaded = load_head_checkpoint(pth, matcher.head_vars)
    direct = convert_gfnet_head_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    _assert_tree_equal(loaded["params"], direct["params"])
    _assert_tree_equal(loaded["batch_stats"], direct["batch_stats"])


def test_pth_through_cli_end_to_end(artifacts, tmp_path):
    """`cli/test.py --conf_path --ckpt_path <pth> --dinov2_weights <npz>`
    produces results identical to a matcher assembled from the in-memory
    conversion — the converter→CLI→matcher loop on the user's artifact
    format (ref `README.md:20-31`, `test.py:37-38`)."""
    from gfnet_tpu.cli.test import main
    from gfnet_tpu.data.dataset import HomographyDataset
    from gfnet_tpu.eval.benchmark import HomographyBenchmark

    ref, conf, pth, npz, conf_path = artifacts

    # reference-layout val dir with 2 synthetic pairs
    root = tmp_path / "data"
    rng = np.random.default_rng(0)
    for sub in ("target", "source", "H_s2t"):
        os.makedirs(root / "test" / "mscoco_1k_448x448" / sub)
    for i in range(2):
        r = np.random.default_rng(i)
        yy, xx = np.mgrid[0:112, 0:112]
        base = (((yy // 14) + (xx // 14)) % 2).astype(np.float32)
        img = np.stack([base, 0.5 * base + 0.2, 1 - base], -1)
        img += r.uniform(0, 0.3, (112, 112, 1))
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        H = np.eye(3)
        H[:2, 2] = rng.uniform(-5, 5, 2)
        tgt = cv2.warpPerspective(img, H.astype(np.float32), (112, 112))
        d = root / "test" / "mscoco_1k_448x448"
        Image.fromarray(img).save(d / "source" / f"{i}.png")
        Image.fromarray(tgt).save(d / "target" / f"{i}.png")
        with open(d / "H_s2t" / f"{i}.json", "w") as f:
            json.dump({"H": H.tolist()}, f)

    results = main([
        "--conf_path", conf_path, "--ckpt_path", pth, "--dinov2_weights", npz,
        "--dataset", "mscoco", "--data_path", str(root), "--max_pairs", "2",
    ])
    assert "mace_mscoco" in results

    # same eval with the in-memory conversion (the parity-validated path)
    cfg = _model_config(conf)
    matcher = GFNetMatcher(
        cfg,
        vit_params={"params": convert_dinov2_state_dict(ref.dino[0].state_dict())},
        head_vars=convert_gfnet_head_state_dict(
            {k: v.numpy() for k, v in ref.state_dict().items()}
        ),
    )
    ds = HomographyDataset("mscoco", mode="val", data_path=str(root),
                           input_resolution=cfg.initial_res)
    direct = HomographyBenchmark(ds).run(matcher, max_pairs=2)
    assert results["mace_mscoco"] == pytest.approx(direct["mace_mscoco"], abs=1e-6)
    for t in (3, 5, 10, 20):
        assert results[f"auc@{t}_mscoco"] == pytest.approx(
            direct[f"auc@{t}_mscoco"], abs=1e-6
        )
