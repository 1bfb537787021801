"""Integration tests: dataset layout → benchmark harness → CLI entry points,
all on a synthetic reference-layout dataset generated into tmp_path."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from PIL import Image  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from gfnet_tpu.config import tiny_test_config  # noqa: E402
from gfnet_tpu.data.dataset import BatchLoader, HomographyDataset  # noqa: E402
from gfnet_tpu.eval.benchmark import HomographyBenchmark, auc  # noqa: E402


def _checker(n=448, cell=28, seed=0):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:n, 0:n]
    base = (((yy // cell) + (xx // cell)) % 2).astype(np.float32)
    img = np.stack([base, r.uniform(0.2, 0.8) * base + 0.2, 1 - base], -1)
    img[..., 0] += xx / n * 0.5
    img[..., 1] += yy / n * 0.5
    noise = r.uniform(0, 0.3, (n, n, 1))
    return (np.clip(img * 0.7 + noise, 0, 1) * 255).astype(np.uint8)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    # mscoco-style test set
    for sub in ("target", "source", "H_s2t"):
        os.makedirs(root / "test" / "mscoco_1k_448x448" / sub)
    for i in range(3):
        img = _checker(seed=i)
        H = np.eye(3)
        H[0, 2], H[1, 2] = rng.uniform(-20, 20, 2)
        H[:2, :2] += rng.uniform(-0.05, 0.05, (2, 2))
        tgt = cv2.warpPerspective(img, H.astype(np.float32), (448, 448))
        Image.fromarray(img).save(root / "test" / "mscoco_1k_448x448" / "source" / f"{i}.png")
        Image.fromarray(tgt).save(root / "test" / "mscoco_1k_448x448" / "target" / f"{i}.png")
        with open(root / "test" / "mscoco_1k_448x448" / "H_s2t" / f"{i}.json", "w") as f:
            json.dump({"H": H.tolist()}, f)
    # googlemap-style train set
    for sub in ("map", "satellite"):
        os.makedirs(root / "train" / "GoogleMap" / sub)
    for i in range(5):
        img = _checker(n=600, seed=100 + i)
        Image.fromarray(img).save(root / "train" / "GoogleMap" / "map" / f"{i}.jpg")
        Image.fromarray((img * 0.8).astype(np.uint8)).save(
            root / "train" / "GoogleMap" / "satellite" / f"{i}.jpg"
        )
    return str(root)


def test_auc_known_values():
    # all errors at 0 → auc == 1 at every threshold
    a = auc([0.0, 0.0, 0.0], [3, 5, 10])
    assert all(abs(v - 1.0) < 1e-6 for v in a)
    # all errors above threshold → auc == 0
    a = auc([50.0, 60.0], [3])
    assert a[0] == 0.0


def test_val_dataset_loads_and_scales_h(data_root):
    ds = HomographyDataset("mscoco", mode="val", data_path=data_root,
                           input_resolution=(448, 448))
    assert len(ds) == 3
    s = ds[0]
    assert s["im_A"].shape == (448, 448, 3)
    assert s["H_s2t"].shape == (3, 3)
    assert 0 <= s["im_A"].min() and s["im_A"].max() <= 1


def test_train_dataset_and_loader(data_root):
    ds = HomographyDataset("googlemap", mode="train", data_path=data_root,
                           input_resolution=(448, 448))
    assert len(ds) == 5
    loader = BatchLoader(ds, batch_size=2, num_workers=2)
    batch = next(iter(loader.batches(1)))
    assert batch["im_A"].shape == (2, 448, 448, 3)
    assert batch["H_s2t"].shape == (2, 3, 3)
    # normalized (imagenet) inputs: negative values must exist
    assert batch["im_A"].min() < 0


def test_benchmark_harness_runs(data_root):
    from gfnet_tpu.matcher.api import GFNetMatcher

    cfg = tiny_test_config()
    matcher = GFNetMatcher(cfg, dtype=jnp.float32)
    ds = HomographyDataset("mscoco", mode="val", data_path=data_root,
                           input_resolution=cfg.initial_res)
    results = HomographyBenchmark(ds).run(matcher, max_pairs=2)
    assert "mace_mscoco" in results and "auc@3_mscoco" in results
    assert 0 <= results["mace_mscoco"] <= 70
    assert results["runtime_mscoco"] > 0


def test_cli_test_entry(data_root, capsys):
    from gfnet_tpu.cli.test import main

    results = main(["--dataset", "mscoco", "--data_path", data_root,
                    "--tiny", "--max_pairs", "2"])
    assert "mace_mscoco" in results


def test_process_sharding_splits_file_lists(data_root):
    d0 = HomographyDataset("mscoco", mode="val", data_path=data_root,
                           process_index=0, process_count=2, input_resolution=(448, 448))
    d1 = HomographyDataset("mscoco", mode="val", data_path=data_root,
                           process_index=1, process_count=2, input_resolution=(448, 448))
    assert len(d0) + len(d1) == 3
    assert set(d0.imgs0).isdisjoint(d1.imgs0)
