"""Multi-host (pod-slice) data-parallel helpers.

The reference is single-node (``torch.nn.DataParallel``); this is the
multi-host extension: DCN-connected hosts each load a shard of the global
batch and assemble a global ``jax.Array`` with
``jax.make_array_from_process_local_data``. Replaces per-GPU scatter with
per-host feeding — the TPU-native pattern from the scaling playbook.

Usage on each host of a pod slice:

    from istnet_tpu.parallel import multihost
    multihost.initialize()                  # jax.distributed handshake
    mesh = make_mesh()                      # all devices across hosts
    batch = multihost.global_batch(mesh, local_batch)   # host-local shard in
    # -> jit_train_step_dp(step, mesh)(state, batch, rng) as on one host

Single-host (process_count == 1) degenerates to ``shard_batch`` — covered by
the regular DP tests; the multi-host path needs a real multi-process run.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from istnet_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS, shard_batch  # noqa: F401

PyTree = Any


def initialize(**kwargs) -> None:
    """jax.distributed.initialize, tolerant ONLY of the single-process case.

    MUST be called before any other JAX API touches the backend (including
    jax.process_count()). When a coordinator IS configured (kwargs or the
    standard env vars), failures propagate — silently degrading a pod run to
    N independent single-host runs would train N wrong models quietly.

    Env-var spec (the product path for ``cli/train.py`` on a pod slice —
    set on every host, no code changes):

        JAX_COORDINATOR_ADDRESS=host0:1234
        JAX_NUM_PROCESSES=4
        JAX_PROCESS_ID=<0..3>

    Cloud-TPU pod slices that auto-detect (GKE/Slurm metadata) need none of
    these; ``jax.distributed.initialize()`` resolves them itself.
    """
    import os

    if not kwargs:
        addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("COORDINATOR_ADDRESS"))
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        if addr and nproc is not None and pid is not None:
            kwargs = dict(coordinator_address=addr,
                          num_processes=int(nproc),
                          process_id=int(pid))
    configured = bool(kwargs) or any(
        os.environ.get(v) for v in
        ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"))
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        if configured:
            raise
        # single-process run with no coordinator configured — fine


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Rendezvous all processes via the coordination service (pure gRPC — no
    device collectives, so it is safe to call while processes are skewed by
    compilation).

    Use it between ``jit(...).lower(...).compile()`` and the first execution
    of a cross-process program: the first collective CREATES the gloo/ICI
    communicators, whose handshake timeout (30 s for CPU gloo's KV exchange)
    is far shorter than possible compile skew between processes. AOT-compile,
    barrier, then execute — all processes then open the communicators
    together. No-op in single-process runs.
    """
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # single-process
        return
    client.wait_at_barrier(name, timeout_ms)


def per_host_batch_size(global_batch: int) -> int:
    """The slice of the global batch THIS host must load."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} hosts")
    return global_batch // n


def global_batch(mesh: Mesh, local_batch: PyTree, spec: P | None = None) -> PyTree:
    """Assemble host-local arrays into a global batch-sharded jax.Array tree.

    ``local_batch`` leaves are numpy arrays whose leading axis is this host's
    shard of the global batch (host order = process index order). ``spec``
    overrides the batch-axis partitioning (default ``P(DATA_AXIS)``; pass
    ``P((DATA_AXIS, FSDP_AXIS))`` to feed a 2-D dp x fsdp mesh, where the
    batch is data-parallel over BOTH axes)."""
    sharding = NamedSharding(mesh, spec if spec is not None else P(DATA_AXIS))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), local_batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)
