from istnet_tpu.parallel.mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    batch_sharding,
    fsdp_shardings,
    jit_eval_forward_dp,
    jit_train_step_dp,
    jit_train_step_fsdp,
    make_mesh,
    make_mesh_2d,
    replicate,
    replicated,
    shard_batch,
    shard_batch_2d,
    shard_state_fsdp,
    state_shardings_fsdp,
)

__all__ = [
    "DATA_AXIS", "FSDP_AXIS", "batch_sharding", "fsdp_shardings",
    "jit_eval_forward_dp", "jit_train_step_dp", "jit_train_step_fsdp",
    "make_mesh", "make_mesh_2d", "replicate", "replicated", "shard_batch",
    "shard_batch_2d", "shard_state_fsdp", "state_shardings_fsdp",
]
