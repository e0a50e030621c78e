"""Worker process for the 2-process multi-host DP test (not a pytest module).

Each process: 2 virtual CPU devices + gloo cross-process collectives ->
``multihost.initialize`` -> one REAL ISTNet DP train step over the global
4-device mesh, with each host feeding only its own half of the global batch
via ``multihost.global_batch``. Prints machine-checkable lines the parent
test asserts on (loss equality across hosts proves the gradient all-reduce
spanned processes — each host's local data differs).

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from istnet_tpu.parallel import multihost

    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    print(f"MH devices={jax.device_count()}", flush=True)
    print(f"MH local={jax.local_device_count()}", flush=True)

    import numpy as np
    import jax.numpy as jnp

    from istnet_tpu.models.ist_net import ISTNet, supervised_loss
    from istnet_tpu.parallel import jit_train_step_dp, make_mesh, replicate
    from istnet_tpu.train.train_state import (create_train_state, make_optimizer,
                                              make_train_step)
    from istnet_tpu.utils.config import Config

    n, img = 128, 48
    global_bs = 4
    local_bs = multihost.per_host_batch_size(global_bs)
    assert local_bs == global_bs // nproc

    # host-local shard of the global batch — DIFFERENT per host
    rng = np.random.RandomState(100 + pid)
    inputs = {
        "rgb": rng.rand(local_bs, img, img, 3).astype(np.float32),
        "pts": (rng.randn(local_bs, n, 3) * 0.1).astype(np.float32),
        "choose": rng.randint(0, img * img, size=(local_bs, n)).astype(np.int32),
        "category_label": rng.randint(0, 6, size=(local_bs,)).astype(np.int32),
        "qo": (rng.randn(local_bs, n, 3) * 0.1).astype(np.float32),
    }
    labels = {
        "rotation_label": np.tile(np.eye(3, dtype=np.float32), (local_bs, 1, 1)),
        "translation_label": np.zeros((local_bs, 3), np.float32),
        "size_label": np.ones((local_bs, 3), np.float32),
        "qo": inputs["qo"],
    }

    model = ISTNet(nclass=6, sa_npoints=(32, 16, 8, 8))
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jax.tree_util.tree_map(jnp.asarray, inputs), train=True)
    cfg = Config({"optimizer": {"name": "Adam", "lr": 0.01, "weight_decay": 0},
                  "max_epoch": 1,
                  "bn": {"bn_momentum": 0.9, "bn_decay": 0.5, "decay_step": 4000,
                         "bnm_clip": 0.01}})
    tx, _ = make_optimizer(cfg, 10, variables["params"])
    step_fn = make_train_step(
        model, lambda e, l: supervised_loss(e, l, 1.0, 10.0, False), tx, cfg.bn)
    state = create_train_state(variables["params"], variables["batch_stats"], tx)

    mesh = make_mesh()  # ALL devices, across processes
    batch = multihost.global_batch(mesh, {"inputs": inputs, "labels": labels})
    dp_step = jit_train_step_dp(step_fn, mesh)
    state = replicate(mesh, state)
    key = jax.random.PRNGKey(7)
    # AOT-compile, THEN rendezvous, THEN execute: the first execution opens
    # the gloo communicators (30 s KV handshake) and per-process compile times
    # on this one-core host can skew by minutes — see multihost.barrier
    compiled = dp_step.lower(state, batch, key).compile()
    print("MH compiled", flush=True)
    multihost.barrier("istnet_mh_compiled")
    state, metrics = compiled(state, batch, key)

    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    # fingerprint of the updated params: must be identical on every host
    leaf = jax.device_get(jax.tree_util.tree_leaves(state.params)[0])
    print(f"MH loss={loss:.10f}", flush=True)
    print(f"MH param_fp={float(np.abs(np.asarray(leaf)).sum()):.10e}", flush=True)

    # --- FSDP leg: same init + same global batch over a 2-D (dp, fsdp) mesh.
    # Params/opt-state live SHARDED across processes (ZeRO-3); the gradient
    # reduce-scatter and weight all-gathers span hosts. Loss must match the
    # DP leg (same math, different collective schedule).
    from jax.sharding import PartitionSpec as P

    from istnet_tpu.parallel import jit_train_step_fsdp, make_mesh_2d, shard_state_fsdp
    from istnet_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS

    mesh2 = make_mesh_2d(2, 2)
    state2 = create_train_state(variables["params"], variables["batch_stats"], tx)
    state2 = shard_state_fsdp(mesh2, state2)
    batch2 = multihost.global_batch(mesh2, {"inputs": inputs, "labels": labels},
                                    spec=P((DATA_AXIS, FSDP_AXIS)))
    fsdp_step = jit_train_step_fsdp(step_fn, mesh2, state2)
    compiled2 = fsdp_step.lower(state2, batch2, key).compile()
    print("MH fsdp_compiled", flush=True)
    multihost.barrier("istnet_mh_fsdp_compiled")
    state2, metrics2 = compiled2(state2, batch2, key)
    loss2 = float(np.asarray(jax.device_get(metrics2["loss"])))
    # params are cross-process sharded (np.asarray on a non-addressable array
    # raises): fingerprint via an in-graph reduction to a replicated scalar
    from istnet_tpu.parallel.mesh import replicated

    fp_fn = jax.jit(
        lambda t: sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                      for l in jax.tree_util.tree_leaves(t)),
        out_shardings=replicated(mesh2))
    fp2 = float(np.asarray(jax.device_get(fp_fn(state2.params))))
    print(f"MH fsdp_loss={loss2:.10f}", flush=True)
    print(f"MH fsdp_param_fp={fp2:.10e}", flush=True)
    # rendezvous BEFORE exiting: jax's atexit distributed.shutdown runs a
    # short coordination barrier, and per-process post-step skew on this
    # one-core host (observed under full-suite contention) can exceed it —
    # one worker then dies with "Shutdown barrier ... 1/2". The explicit
    # barrier has a generous timeout and collapses the skew to ~0.
    multihost.barrier("istnet_mh_done")
    print("MH ok", flush=True)


if __name__ == "__main__":
    main()
