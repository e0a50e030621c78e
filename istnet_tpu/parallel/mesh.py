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
FSDP_AXIS = "fsdp"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_2d(dp: int, fsdp: int) -> Mesh:
    """2-D (dp, fsdp) mesh for ZeRO-style parameter/optimizer sharding.

    Lay the ``fsdp`` axis innermost so its all-gathers/reduce-scatters ride
    the fastest ICI links; ``dp`` gradient psums cross the outer axis once
    per step. On real TPUs the raw ``jax.devices()`` enumeration does not
    guarantee ICI adjacency, so use ``mesh_utils.create_device_mesh`` (which
    solves for a torus-aligned layout) whenever the full device set is used;
    fall back to a plain reshape for partial meshes / virtual CPU devices.
    """
    devices = jax.devices()
    if dp * fsdp > len(devices):
        raise ValueError(f"mesh {dp}x{fsdp} needs {dp * fsdp} devices, "
                         f"have {len(devices)}")
    if dp * fsdp == len(devices) and devices[0].platform == "tpu":
        from jax.experimental import mesh_utils
        try:
            grid = mesh_utils.create_device_mesh((dp, fsdp))
        except Exception:
            # create_device_mesh can raise for shapes that don't factor the
            # physical topology; a plain reshape is always valid (just not
            # guaranteed ICI-adjacent) — prefer working over optimal
            grid = np.asarray(devices).reshape(dp, fsdp)
    else:
        grid = np.asarray(devices[: dp * fsdp]).reshape(dp, fsdp)
    return Mesh(grid, (DATA_AXIS, FSDP_AXIS))


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

    COPY-SAFE against donation: ``device_put`` to a compatible sharding
    ALIASES the source buffer on its home device, so a later donating step
    (``jit_train_step_dp``, donate_argnums=(0,)) would delete the caller's
    original tree through the alias (round-2 multichip regression). A jitted
    identity with ``out_shardings`` always materializes fresh buffers —
    XLA cannot alias input to output without donation.
    """
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.jit(lambda t: t, out_shardings=sh)(tree)

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


# ---------------------------------------------------------------------------
# FSDP (ZeRO-3 style) over a 2-D (dp, fsdp) mesh
# ---------------------------------------------------------------------------

def _fsdp_leaf_spec(x, fsdp_size: int, min_size: int) -> P:
    """PartitionSpec sharding x's largest divisible axis over ``fsdp``.

    Leaves smaller than ``min_size`` elements (biases, BN scales, scalar
    schedule state) stay replicated: gathering them costs more in collective
    latency than the memory they'd save.
    """
    shape = getattr(x, "shape", ())
    if not shape or x.size < min_size:
        return P()
    # largest axis first; ties -> earliest axis (stable for conv kernels where
    # the trailing channel axes dominate)
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % fsdp_size == 0 and shape[i] >= fsdp_size:
            spec = [None] * len(shape)
            spec[i] = FSDP_AXIS
            return P(*spec)
    return P()


def fsdp_shardings(mesh: Mesh, tree: PyTree, min_size: int = 2 ** 11) -> PyTree:
    """Per-leaf NamedShardings: each large leaf split over the fsdp axis."""
    fsdp_size = mesh.shape[FSDP_AXIS]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, _fsdp_leaf_spec(x, fsdp_size, min_size)),
        tree)


def state_shardings_fsdp(mesh: Mesh, state: PyTree,
                         min_size: int = 2 ** 11) -> PyTree:
    """Shardings for a TrainState: params + opt_state sharded over fsdp,
    step/batch_stats replicated (stats are small and the BN-EMA reads them
    densely every step)."""
    rep = replicated(mesh)
    fsdp_size = mesh.shape[FSDP_AXIS]

    def one(path, leaf):
        top = path[0].name if hasattr(path[0], "name") else str(path[0])
        if top in ("params", "opt_state"):
            return NamedSharding(mesh, _fsdp_leaf_spec(leaf, fsdp_size, min_size))
        return rep

    return jax.tree_util.tree_map_with_path(one, state)


def shard_batch_2d(mesh: Mesh, batch: PyTree) -> PyTree:
    """Batch axis sharded over BOTH mesh axes (pure data parallelism of
    degree dp*fsdp; the fsdp axis only shards *storage* of params)."""
    sh = NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def _place_host_local(x, sh: NamedSharding):
    """Place a host-local (same value on every process) array under an
    arbitrary NamedSharding without cross-process value checks: each local
    device gets its slice via the sharding's addressable index map, then the
    global array is assembled from the single-device shards (same rationale
    as ``replicate``'s multi-process branch)."""
    x = np.asarray(x)
    idx_map = sh.addressable_devices_indices_map(x.shape)
    shards = [jax.device_put(x[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(x.shape, sh, shards)


def shard_state_fsdp(mesh: Mesh, state: PyTree,
                     min_size: int = 2 ** 11) -> PyTree:
    """Place a host-local TrainState onto the mesh with FSDP shardings.

    Copy-safe against donation (see ``replicate``): replicated small leaves
    under a plain ``device_put`` would alias the source buffers; the jitted
    identity materializes fresh buffers for every leaf. Multi-process: every
    process passes the same values (same-seed init or a shared checkpoint)
    and each places only its local shards — no cross-process transfer.
    """
    shardings = state_shardings_fsdp(mesh, state, min_size)
    if jax.process_count() == 1:
        return jax.jit(lambda t: t, out_shardings=shardings)(state)
    return jax.tree_util.tree_map(_place_host_local, state, shardings)


def jit_train_step_fsdp(train_step, mesh: Mesh, state: PyTree,
                        min_size: int = 2 ** 11):
    """jit the train step over a 2-D (dp, fsdp) mesh, ZeRO-3 style.

    Params and optimizer state live sharded over the ``fsdp`` axis; the batch
    is sharded over both axes. GSPMD inserts the all-gather of each weight
    before its matmul and the reduce-scatter of its gradient — the TPU-native
    equivalent of torch FSDP, with zero model-code changes. ``state`` is the
    (host or device) TrainState used to derive per-leaf shardings;
    ``min_size`` must match the value given to ``shard_state_fsdp`` (a
    mismatch would reshard mid-threshold leaves every step AND defeat
    donation — the donated buffers would have the wrong sharding).
    """
    st_sh = state_shardings_fsdp(mesh, state, min_size)
    rep = replicated(mesh)
    batch_sh = NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))
    return jax.jit(
        train_step,
        in_shardings=(st_sh, batch_sh, rep),
        out_shardings=(st_sh, rep),
        donate_argnums=(0,),
    )
