"""FSDP (ZeRO-3 style) train step over a 2-D (dp, fsdp) mesh.

The reference has no FSDP equivalent (its only parallelism is
``nn.DataParallel``, train.py:98-99); this is the TPU-native scaling path for
models whose params/optimizer state exceed one chip's HBM: params live
sharded over the ``fsdp`` axis, GSPMD inserts the per-layer all-gathers and
gradient reduce-scatters. These tests pin (a) numerical equivalence to the
plain DP step and (b) that the big leaves are genuinely sharded in storage.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from istnet_tpu.nn.layers import BatchNorm
from istnet_tpu.parallel import (
    FSDP_AXIS, jit_train_step_dp, jit_train_step_fsdp, make_mesh,
    make_mesh_2d, replicate, shard_batch, shard_batch_2d, shard_state_fsdp,
    state_shardings_fsdp)
from istnet_tpu.train.train_state import (
    create_train_state, make_optimizer, make_train_step)
from istnet_tpu.utils.config import Config


class Toy(nn.Module):
    width: int = 256  # > 2*fsdp and > min_size/width so kernels shard

    @nn.compact
    def __call__(self, inputs, train: bool):
        x = nn.Dense(self.width)(inputs["x"])
        x = BatchNorm()(x, train)
        x = nn.relu(x)
        x = nn.Dense(self.width)(x)
        return {"y": nn.Dense(1)(x)}


def _cfg():
    return Config({
        "optimizer": {"name": "Adam", "lr": 0.01, "betas": [0.5, 0.999],
                      "eps": 1e-6, "adam_eps": 1e-6, "weight_decay": 0},
        "max_epoch": 30,
        "bn": {"bn_momentum": 0.9, "bn_decay": 0.5, "decay_step": 4000,
               "bnm_clip": 0.01},
    })


def _setup(batch_size=16):
    model = Toy()
    rng = np.random.RandomState(0)
    batch = {
        "inputs": {"x": jnp.asarray(rng.randn(batch_size, 32), jnp.float32)},
        "labels": {"t": jnp.asarray(rng.randn(batch_size, 1), jnp.float32)},
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch["inputs"],
                           train=True)

    def loss_fn(out, labels):
        l = jnp.mean((out["y"] - labels["t"]) ** 2)
        return l, {"mse": l}

    cfg = _cfg()
    tx, _ = make_optimizer(cfg, 4000, variables["params"])
    step_fn = make_train_step(model, loss_fn, tx, cfg.bn)
    state = create_train_state(variables["params"], variables["batch_stats"], tx)
    return step_fn, state, batch


def test_fsdp_step_matches_dp():
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    step_fn, state, batch = _setup()

    # DP reference over the 1-D mesh (itself pinned to single-device in
    # test_train.py), computed first: both jits donate their state arg.
    mesh1 = make_mesh()
    dp_step = jit_train_step_dp(step_fn, mesh1)
    ref_state, ref_metrics = dp_step(replicate(mesh1, state),
                                     shard_batch(mesh1, batch),
                                     jax.random.PRNGKey(1))

    mesh = make_mesh_2d(dp=2, fsdp=4)
    fsdp_step = jit_train_step_fsdp(step_fn, mesh, state)
    st = shard_state_fsdp(mesh, state)
    new_state, metrics = fsdp_step(st, shard_batch_2d(mesh, batch),
                                   jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.batch_stats),
                    jax.tree_util.tree_leaves(ref_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fsdp_params_actually_sharded():
    """The 256x256 Dense kernel (and its Adam moments) must be split 4-way
    over the fsdp axis in storage; small leaves stay replicated."""
    assert jax.device_count() == 8
    step_fn, state, batch = _setup()
    mesh = make_mesh_2d(dp=2, fsdp=4)
    st = shard_state_fsdp(mesh, state)

    kernels = [l for l in jax.tree_util.tree_leaves(st.params)
               if getattr(l, "ndim", 0) == 2 and l.shape == (256, 256)]
    assert kernels, "toy model should have a 256x256 kernel"
    for k in kernels:
        shard_shape = k.sharding.shard_shape(k.shape)
        assert np.prod(shard_shape) == np.prod(k.shape) // 4, (
            f"kernel not 4-way sharded: {k.shape} -> {shard_shape}")

    # Adam moments follow the same shardings
    m_leaves = [l for l in jax.tree_util.tree_leaves(st.opt_state)
                if getattr(l, "shape", ()) == (256, 256)]
    assert m_leaves, "Adam mu/nu for the 256x256 kernel expected"
    for l in m_leaves:
        assert np.prod(l.sharding.shard_shape(l.shape)) == l.size // 4

    # biases (256,) divisible by 4 but tiny -> replicated by min_size
    biases = [l for l in jax.tree_util.tree_leaves(st.params)
              if getattr(l, "shape", ()) == (256,)]
    assert biases
    for b in biases:
        assert b.sharding.is_fully_replicated

    # the sharding spec tree mentions the fsdp axis for the big leaves
    sh = state_shardings_fsdp(mesh, state)
    specs = [s.spec for s in jax.tree_util.tree_leaves(sh)
             if hasattr(s, "spec")]
    assert any(FSDP_AXIS in spec for spec in specs)


def test_fsdp_runs_multiple_steps_and_donates():
    """Donation + resharded outputs: run 3 chained steps, loss decreases."""
    assert jax.device_count() == 8
    step_fn, state, batch = _setup()
    mesh = make_mesh_2d(dp=4, fsdp=2)
    fsdp_step = jit_train_step_fsdp(step_fn, mesh, state)
    st = shard_state_fsdp(mesh, state)
    b = shard_batch_2d(mesh, batch)
    losses = []
    for i in range(3):
        st, metrics = fsdp_step(st, b, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert int(st.step) == 3
    assert losses[-1] < losses[0]


def test_mesh_2d_validates_device_count():
    with pytest.raises(ValueError):
        make_mesh_2d(dp=8, fsdp=2)


def test_fsdp_checkpoint_roundtrip(tmp_path):
    """Save an FSDP-sharded TrainState with Orbax, restore it BOTH ways
    (sharded via restore_checkpoint_sharded, and to host numpy via the plain
    template restore), resume one step on each, and compare to the
    never-checkpointed trajectory — epoch-5 checkpointing under a 2x4 mesh
    must be lossless and resharding-exact."""
    assert jax.device_count() == 8
    from istnet_tpu.train import checkpoints

    step_fn, state, batch = _setup()
    mesh = make_mesh_2d(dp=2, fsdp=4)
    fsdp_step = jit_train_step_fsdp(step_fn, mesh, state)
    st = shard_state_fsdp(mesh, state)
    b = shard_batch_2d(mesh, batch)

    st, _ = fsdp_step(st, b, jax.random.PRNGKey(0))

    # save the SHARDED state directly (what Solver.solve does for fsdp>1);
    # Orbax writes per-shard, no jax.device_get
    ckpt_dir = str(tmp_path / "ckpt")
    checkpoints.save_checkpoint(ckpt_dir, 5, st)

    # continue the uncheckpointed trajectory one more step
    ref_state, ref_metrics = fsdp_step(st, b, jax.random.PRNGKey(1))
    ref_params = jax.device_get(ref_state.params)

    # (a) sharded restore: straight back into the 2x4 shardings
    host_template = jax.device_get(
        shard_state_fsdp(mesh, _setup()[1]))  # fresh state, same structure
    shardings = state_shardings_fsdp(mesh, host_template)
    restored, meta = checkpoints.restore_checkpoint_sharded(
        ckpt_dir, 5, host_template, shardings)
    assert meta["epoch"] == 5
    for leaf in jax.tree_util.tree_leaves(restored.params):
        assert leaf.sharding.mesh.shape == {"dp": 2, "fsdp": 4}
    res_state, res_metrics = fsdp_step(restored, b, jax.random.PRNGKey(1))
    assert float(res_metrics["loss"]) == float(ref_metrics["loss"])
    for a, r in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(jax.device_get(res_state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r))

    # (b) host restore of the same sharded checkpoint (the CLI resume path),
    # re-sharded by the Solver: same trajectory
    payload = checkpoints.restore_checkpoint(
        ckpt_dir, 5,
        {"params": host_template.params,
         "batch_stats": host_template.batch_stats,
         "opt_state": host_template.opt_state,
         "step": host_template.step, "meta": {"epoch": 0}})
    st2 = shard_state_fsdp(mesh, host_template.replace(
        step=payload["step"], params=payload["params"],
        batch_stats=payload["batch_stats"], opt_state=payload["opt_state"]))
    res2, m2 = fsdp_step(st2, b, jax.random.PRNGKey(1))
    assert float(m2["loss"]) == float(ref_metrics["loss"])
    for a, r in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(jax.device_get(res2.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r))


def test_fsdp_sharded_restore_with_extra_meta(tmp_path):
    """ADVICE r4: restore_checkpoint_sharded used to hardcode the meta
    template to {"epoch": 0}, so a checkpoint saved with save_checkpoint's
    ``extra_meta`` kwarg failed Orbax structure matching on FSDP resume. The
    template is now built from the checkpoint's own tree metadata."""
    from istnet_tpu.train import checkpoints

    step_fn, state, batch = _setup()
    mesh = make_mesh_2d(dp=2, fsdp=4)
    st = shard_state_fsdp(mesh, state)
    ckpt_dir = str(tmp_path / "ckpt")
    checkpoints.save_checkpoint(ckpt_dir, 5, st,
                                extra_meta={"iter": 1234, "wall_s": 2.5})

    host_template = jax.device_get(shard_state_fsdp(mesh, _setup()[1]))
    shardings = state_shardings_fsdp(mesh, host_template)
    restored, meta = checkpoints.restore_checkpoint_sharded(
        ckpt_dir, 5, host_template, shardings)
    assert meta["epoch"] == 5
    assert meta["iter"] == 1234
    assert meta["wall_s"] == 2.5
    for a, r in zip(jax.tree_util.tree_leaves(jax.device_get(st.params)),
                    jax.tree_util.tree_leaves(jax.device_get(restored.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r))


def test_solver_rejects_fsdp_over_device_count():
    """ADVICE r4: single-process fsdp > device_count used to fall through to
    a cryptic ZeroDivisionError; now a clear up-front raise."""
    from istnet_tpu.train.solver import Solver

    cfg = Config({"max_epoch": 1, "parallel": {"fsdp": 16}})
    with pytest.raises(ValueError, match="exceeds"):
        Solver(None, None, None, cfg, None)
