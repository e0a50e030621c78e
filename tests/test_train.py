"""Schedules, optimizer masking, BN-EMA update, and 8-device DP train step."""

import jax
import jax.numpy as jnp
import numpy as np

from istnet_tpu.train.schedules import bn_momentum, cyclic_triangular_lr
from istnet_tpu.train.train_state import (
    create_train_state, ema_batch_stats, make_optimizer, make_train_step)
from istnet_tpu.utils.config import Config


def test_cyclic_lr_matches_torch_values():
    # torch CyclicLR(triangular, base 1e-5, max 1e-3, up=down=20000)
    lr = cyclic_triangular_lr
    assert np.isclose(float(lr(0)), 1e-5)
    assert np.isclose(float(lr(20000)), 1e-3)
    assert np.isclose(float(lr(40000)), 1e-5, atol=1e-9)
    assert np.isclose(float(lr(10000)), 1e-5 + (1e-3 - 1e-5) * 0.5)
    assert np.isclose(float(lr(30000)), 1e-5 + (1e-3 - 1e-5) * 0.5)


def test_bn_momentum_schedule():
    # 0.9 * 0.5^(step/4000) clipped at 0.01 (solver.py:48-49, yaml:16-20)
    assert np.isclose(float(bn_momentum(0)), 0.9)
    assert np.isclose(float(bn_momentum(4000)), 0.45)
    assert np.isclose(float(bn_momentum(8000)), 0.225)
    assert np.isclose(float(bn_momentum(100000)), 0.01)
    assert np.isclose(float(bn_momentum(3999)), 0.9)  # floor semantics


def test_ema_batch_stats_torch_semantics():
    running = {"bn": {"mean": jnp.zeros(3), "var": jnp.ones(3)}}
    batch = {"bn": {"mean": jnp.ones(3), "var": 3.0 * jnp.ones(3)}}
    out = ema_batch_stats(running, batch, jnp.asarray(0.9))
    np.testing.assert_allclose(np.asarray(out["bn"]["mean"]), 0.9, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["bn"]["var"]), 0.1 + 2.7, rtol=1e-6)


def _toy_cfg():
    # adam_eps raised: near-zero grads make tiny-eps Adam updates sign-flip on
    # psum-vs-serial reduction-order noise, which this test would amplify
    return Config({
        "optimizer": {"name": "Adam", "lr": 0.01, "betas": [0.5, 0.999],
                      "eps": 1e-6, "adam_eps": 1e-6, "weight_decay": 0},
        "max_epoch": 30,
        "bn": {"bn_momentum": 0.9, "bn_decay": 0.5, "decay_step": 4000,
               "bnm_clip": 0.01},
    })


def test_frozen_subtree_not_updated():
    params = {"world_enhancer": {"w": jnp.ones(4)}, "main": {"w": jnp.ones(4)}}
    tx, _ = make_optimizer(_toy_cfg(), 4000, params, frozen_prefix="world_enhancer")
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert float(jnp.sum(jnp.abs(updates["world_enhancer"]["w"]))) == 0.0
    assert float(jnp.sum(jnp.abs(updates["main"]["w"]))) > 0.0


def test_dp_train_step_8_devices():
    """Toy BN-model train step under an 8-device mesh: replicated params,
    sharded batch, identical result to single-device."""
    import flax.linen as nn
    from istnet_tpu.nn.layers import BatchNorm
    from istnet_tpu.parallel import jit_train_step_dp, make_mesh, replicate, shard_batch

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, inputs, train: bool):
            x = nn.Dense(8)(inputs["x"])
            x = BatchNorm()(x, train)
            return {"y": nn.Dense(1)(x)}

    model = Toy()
    rs = np.random.RandomState(0)
    # labels must have nonzero mean: with t=0 the final Dense bias grad is
    # 2*mean(y), and y = W@BN(x) + 0 has EXACTLY zero mean (BN output is
    # zero-mean), so that grad is pure rounding noise — psum-vs-serial
    # reassociation then flips its sign and Adam's first step amplifies the
    # flip to ~lr, failing any sensible tolerance.
    batch = {
        "inputs": {"x": jnp.asarray(rs.randn(16, 4), jnp.float32)},
        "labels": {"t": jnp.asarray(1.0 + rs.randn(16, 1), jnp.float32)},
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch["inputs"], train=True)

    def loss_fn(out, labels):
        l = jnp.mean((out["y"] - labels["t"]) ** 2)
        return l, {"mse": l}

    cfg = _toy_cfg()
    tx, _ = make_optimizer(cfg, 4000, variables["params"])
    step_fn = make_train_step(model, loss_fn, tx, cfg.bn)
    state = create_train_state(variables["params"], variables["batch_stats"], tx)

    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    # reference single-device result FIRST: replicate() may alias buffers that
    # the donating dp_step later invalidates
    ref_state, ref_metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh()
    dp_step = jit_train_step_dp(step_fn, mesh)
    state_dp = replicate(mesh, state)
    batch_dp = shard_batch(mesh, batch)
    new_state, metrics = dp_step(state_dp, batch_dp, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    # BN running stats updated with momentum 0.9 at step 0
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(new_state.batch_stats)[0]),
        np.asarray(jax.tree_util.tree_leaves(ref_state.batch_stats)[0]), rtol=1e-4, atol=1e-6)


def test_multihost_helpers_single_process():
    from istnet_tpu.parallel import make_mesh
    from istnet_tpu.parallel import multihost

    assert multihost.per_host_batch_size(16) == 16  # single process
    mesh = make_mesh()
    batch = {"x": np.ones((16, 3), np.float32)}
    out = multihost.global_batch(mesh, batch)
    assert out["x"].shape == (16, 3)
    assert len(out["x"].sharding.device_set) == 8  # sharded over the mesh
