"""Device mesh + data-parallel sharding.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(``train.py:98-99``). The TPU-native equivalent: a 1-D ``jax.sharding.Mesh``
over all devices with the batch dim sharded and parameters replicated;
gradient all-reduce is inserted by XLA (GSPMD) as ``psum`` over ICI, and the
same code scales to multi-host (DCN) via ``jax.distributed.initialize`` +
per-host data feeding.

Note one deliberate semantic upgrade: BatchNorm statistics are computed over
the GLOBAL batch (sync-BN) because the batch mean under GSPMD is a global
reduction — DataParallel keeps per-replica stats. Sync-BN is the standard
improvement and matters at small per-device batches.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any

DATA_AXIS = "dp"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: PyTree) -> PyTree:
    """Place a host-local batch onto the mesh, batch-dim sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: PyTree) -> PyTree:
    """Replicate a host-local tree onto the mesh.

    Multi-process: assembled from per-local-device copies
    (``make_array_from_single_device_arrays``) instead of a plain
    ``device_put``, which would trigger jax's cross-process ``assert_equal``
    value check — an all-gather of the whole tree that (a) is wasteful and
    (b) creates gloo/ICI communicators at an arbitrary point where process
    compile skew can exceed the transport's handshake timeout (observed: CPU
    gloo's 30 s KV timeout). Callers must pass the same values on every
    process (true by construction: same-seed init or a shared checkpoint).
    """
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)

    local = mesh.local_devices

    def put(x):
        x = np.asarray(x)
        shards = [jax.device_put(x, d) for d in local]
        return jax.make_array_from_single_device_arrays(x.shape, sh, shards)

    return jax.tree_util.tree_map(put, tree)


def jit_eval_forward_dp(apply_fn, variables: PyTree, mesh: Mesh):
    """DP-sharded eval forward for serving / test loops.

    The DP equivalent of the reference's DataParallel wrap of the eval model
    (``test.py:91-92``): variables are replicated onto the mesh ONCE, each
    instance batch is sharded on its leading axis, outputs stay sharded (the
    host's ``np.asarray`` gathers lazily). ``apply_fn(variables, inputs) ->
    end_points``. Returns ``forward(inputs)`` for ``test_func`` /
    ``test_func_batched``; batch sizes must be divisible by the mesh size.
    """
    rep = replicated(mesh)
    dp = batch_sharding(mesh)
    vars_r = replicate(mesh, variables)
    fwd = jax.jit(apply_fn, in_shardings=(rep, dp), out_shardings=dp)

    def forward(inputs):
        return fwd(vars_r, inputs)

    return forward


def jit_train_step_dp(train_step, mesh: Mesh):
    """jit the train step with explicit DP shardings: state/rng replicated,
    batch sharded on its leading axis; outputs replicated."""
    rep = replicated(mesh)
    dp = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, dp, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
