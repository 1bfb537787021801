"""Train-step tests on the 8-device virtual CPU mesh: sharded execution,
loss decrease, BN stat updates, LR schedule, checkpoint round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gfnet_tpu.config import TrainConfig, tiny_test_config
from gfnet_tpu.matcher.api import GFNetMatcher
from gfnet_tpu.parallel.mesh import create_mesh, shard_batch
from gfnet_tpu.train.loss import RobustLoss
from gfnet_tpu.train.state import create_train_state, make_lr_schedule
from gfnet_tpu.train.step import make_train_step


@pytest.fixture(scope="module")
def harness():
    cfg = tiny_test_config()
    matcher = GFNetMatcher(cfg, dtype=jnp.float32)
    mesh = create_mesh(8)
    loss = RobustLoss(im_size=cfg.initial_res[0])
    step = make_train_step(matcher, loss, mesh)
    return cfg, matcher, mesh, step


@pytest.fixture()
def setup(harness):
    """Fresh (donatable) train state per test."""
    cfg, matcher, mesh, step = harness
    tcfg = TrainConfig(grad_clip_norm=0.01)
    # copy: the step donates state buffers, and head_vars is shared across tests
    head_vars = jax.tree_util.tree_map(jnp.array, matcher.head_vars)
    state = create_train_state(head_vars, tcfg, global_batch=8)
    return cfg, matcher, mesh, state, step


def _fake_batch(cfg, b=8, seed=0):
    rng = np.random.default_rng(seed)
    h, w = cfg.initial_res
    H = np.broadcast_to(np.eye(3, dtype=np.float32), (b, 3, 3)).copy()
    H[:, 0, 2] = rng.uniform(-5, 5, b)
    H[:, 1, 2] = rng.uniform(-5, 5, b)
    return {
        "im_A": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "im_B": rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32),
        "H_s2t": H,
    }


def test_train_step_runs_sharded(setup):
    cfg, matcher, mesh, state, step = setup
    batch = shard_batch(mesh, _fake_batch(cfg))
    old_params = jax.tree_util.tree_map(np.asarray, state.params)  # host copy (state is donated)
    new_state, metrics = step(state, matcher.vit_params, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["grad_norm"]) > 0
    # grad clip at 0.01 means the applied update norm is bounded; check params moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - np.asarray(b)))), old_params, new_state.params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_loss_decreases_on_repeated_batch(setup):
    cfg, matcher, mesh, state, step = setup
    batch = shard_batch(mesh, _fake_batch(cfg, seed=1))
    losses = []
    for _ in range(5):
        state, metrics = step(state, matcher.vit_params, batch)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0], losses


def test_batch_stats_update(setup):
    cfg, matcher, mesh, state, step = setup
    batch = shard_batch(mesh, _fake_batch(cfg, seed=2))
    before = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.batch_stats)]
    new_state, _ = step(state, matcher.vit_params, batch)
    after = jax.tree_util.tree_leaves(new_state.batch_stats)
    changed = any(float(np.max(np.abs(a - np.asarray(b)))) > 0 for a, b in zip(before, after))
    assert changed


def test_lr_schedule_matches_cosine_annealing():
    tcfg = TrainConfig(total_pairs=100_000, ckpt_every_pairs=10_000)
    gb = 10
    sched = make_lr_schedule(tcfg, gb)  # k = 1000 steps/chunk, 10 epochs
    base = tcfg.lr_per_sample * gb
    assert float(sched(0)) == pytest.approx(base)
    assert float(sched(999)) == pytest.approx(base)  # within first chunk
    assert float(sched(1000)) == pytest.approx(
        base * 0.5 * (1 + np.cos(np.pi * 1 / 10))
    )
    assert float(sched(10_000)) == pytest.approx(0.0, abs=1e-12)


def test_checkpoint_roundtrip(tmp_path, setup):
    from gfnet_tpu.train.checkpoint import Checkpointer

    cfg, matcher, mesh, state, step = setup
    batch = shard_batch(mesh, _fake_batch(cfg, seed=3))
    tcfg = TrainConfig(grad_clip_norm=0.01)
    template = create_train_state(matcher.head_vars, tcfg, global_batch=8)
    state2, _ = step(state, matcher.vit_params, batch)
    ck = Checkpointer(str(tmp_path), "exp")
    ck.save(state2)
    restored = ck.restore(template)
    assert restored is not None
    assert int(restored.step) == int(state2.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # fresh state (no file) -> None
    assert Checkpointer(str(tmp_path), "other").restore(template) is None


def test_checkpoint_crash_during_save_leaves_restorable(tmp_path, setup):
    """Kill-during-save safety (versioned step dirs): a later save that dies
    mid-write must leave the previous checkpoint restorable, and retention
    prunes only committed older versions."""
    import os

    from gfnet_tpu.train.checkpoint import Checkpointer

    cfg, matcher, mesh, state, step = setup
    tcfg = TrainConfig(grad_clip_norm=0.01)
    template = create_train_state(matcher.head_vars, tcfg, global_batch=8)
    ck = Checkpointer(str(tmp_path), "exp", keep=2)
    ck.save(state)
    first = ck.latest_path
    assert first is not None and first.endswith("step_000000000")

    # simulate a crash mid-save of the NEXT version: orbax stages under a
    # tmp-suffixed name, so a dead partial write looks like this
    partial = os.path.join(ck.dir, "step_000000100.orbax-checkpoint-tmp-123")
    os.makedirs(os.path.join(partial, "params"))
    with open(os.path.join(partial, "params", "garbage"), "w") as f:
        f.write("partial")

    restored = ck.restore(template)
    assert restored is not None
    assert int(restored.step) == int(state.step)

    # retention: a third committed save prunes the oldest, never the newest
    s2 = state.replace(step=state.step + 1)
    s3 = state.replace(step=state.step + 2)
    ck.save(s2)
    ck.save(s3)
    names = sorted(d for d in os.listdir(ck.dir) if d.startswith("step_") and "tmp" not in d)
    assert names == ["step_000000001", "step_000000002"]
    assert int(ck.restore(template).step) == int(s3.step)


def test_fsdp_vit_sharded_step(harness):
    """Frozen ViT sharded over the data axis: step compiles + runs, and the
    large leaves really are distributed (per-device shard < full size)."""
    cfg, matcher, mesh, step_unused = harness
    from gfnet_tpu.parallel.mesh import shard_params
    from gfnet_tpu.train.loss import RobustLoss

    tcfg = TrainConfig(grad_clip_norm=0.01)
    head_vars = jax.tree_util.tree_map(jnp.array, matcher.head_vars)
    state = create_train_state(head_vars, tcfg, global_batch=8)
    loss = RobustLoss(im_size=cfg.initial_res[0])
    step = make_train_step(matcher, loss, mesh, fsdp_vit=True, fsdp_min_size=1000)
    from gfnet_tpu.parallel.mesh import fsdp_param_sharding
    shardings = fsdp_param_sharding(mesh, matcher.vit_params, min_size=1000)
    vit_sharded = jax.tree_util.tree_map(jax.device_put, matcher.vit_params, shardings)
    big = [x for x in jax.tree_util.tree_leaves(vit_sharded) if x.size >= 1000]
    assert big, "expected some sharded leaves"
    assert any(
        x.addressable_shards[0].data.size < x.size for x in big
    ), "no leaf actually sharded"
    batch = shard_batch(mesh, _fake_batch(cfg, seed=7))
    new_state, metrics = step(state, vit_sharded, batch)
    assert np.isfinite(float(metrics["total_loss"]))


def test_module_clip_caps_subtree_without_freezing(setup, monkeypatch):
    """make_train_step(module_clip={...}) caps the named module's grad-norm
    contribution BEFORE the global clip while leaving it trainable — the
    stabilized recipe that lets the cross-view decoder learn appearance
    invariance instead of being frozen out (VERDICT r4 #3)."""
    monkeypatch.setenv("GFNET_GRAD_BREAKDOWN", "1")
    cfg, matcher, mesh, state, _ = setup
    loss = RobustLoss(im_size=cfg.initial_res[0])
    cap = 1e-4
    cstep = make_train_step(matcher, loss, mesh, module_clip={"crossview": cap})
    batch = shard_batch(mesh, _fake_batch(cfg))
    old = jax.tree_util.tree_map(np.asarray, state.params)
    new_state, metrics = cstep(state, matcher.vit_params, batch)
    # the capped subtree's (post-clip) norm respects the cap...
    assert float(metrics["gnorm/crossview"]) <= cap * (1 + 1e-4)
    # ...other modules' grads are untouched by it
    assert float(metrics["gnorm/encoder"]) > cap
    # ...and crossview still LEARNS (moved more than AdamW's wd-only decay)
    drift = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - np.asarray(b)))),
        old["crossview"], new_state.params["crossview"],
    )
    assert max(jax.tree_util.tree_leaves(drift)) > 1e-5


def test_module_clip_typo_fails_fast(setup):
    cfg, matcher, mesh, state, _ = setup
    loss = RobustLoss(im_size=cfg.initial_res[0])
    bad = make_train_step(matcher, loss, mesh, module_clip={"cross_view": 1.0})
    with pytest.raises(AssertionError, match="cross_view"):
        bad(state, matcher.vit_params, shard_batch(mesh, _fake_batch(cfg)))


def test_freeze_zeroes_module_grads(setup):
    """make_train_step(freeze=...) pins the listed top-level modules: their
    params stay put (up to AdamW's decoupled lr*wd decay, ~5e-7/step) while
    every other module still learns. Guards the synthetic-proxy recipe that
    freezes the cross-view block (its grads explode under a random backbone,
    see train/step.py)."""
    cfg, matcher, mesh, state, _ = setup
    loss = RobustLoss(im_size=cfg.initial_res[0])
    fstep = make_train_step(matcher, loss, mesh, freeze=("crossview",))
    batch = shard_batch(mesh, _fake_batch(cfg))
    old = jax.tree_util.tree_map(np.asarray, state.params)
    new_state, metrics = fstep(state, matcher.vit_params, batch)
    assert float(metrics["grad_norm"]) > 0  # the rest still has gradient
    drift = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - np.asarray(b)))),
        old["crossview"], new_state.params["crossview"],
    )
    assert max(jax.tree_util.tree_leaves(drift)) < 1e-5
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - np.asarray(b)))),
        {k: v for k, v in old.items() if k != "crossview"},
        {k: v for k, v in dict(new_state.params).items() if k != "crossview"},
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_uint8_batch_transport_matches_host_normalization(setup):
    """uint8 batches (device-side imagenet normalization, 4x less transfer)
    produce the same loss as the equivalent host-normalized f32 batch."""
    cfg, matcher, mesh, state, step = setup
    rng = np.random.default_rng(9)
    h, w = cfg.initial_res
    b = 8
    raw_a = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    raw_b = rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    H = np.broadcast_to(np.eye(3, dtype=np.float32), (b, 3, 3)).copy()
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    f32_batch = {
        "im_A": (raw_a.astype(np.float32) / 255.0 - mean) / std,
        "im_B": (raw_b.astype(np.float32) / 255.0 - mean) / std,
        "H_s2t": H,
    }
    u8_batch = {"im_A": raw_a, "im_B": raw_b, "H_s2t": H}
    state2 = jax.tree_util.tree_map(jnp.array, state)
    _, m_f32 = step(state, matcher.vit_params, shard_batch(mesh, f32_batch))
    _, m_u8 = step(state2, matcher.vit_params, shard_batch(mesh, u8_batch))
    np.testing.assert_allclose(
        float(m_u8["total_loss"]), float(m_f32["total_loss"]), rtol=1e-5
    )
