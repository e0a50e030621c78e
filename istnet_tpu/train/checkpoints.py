"""Orbax checkpointing + the two-phase partial-load/freeze recipe.

Replaces gorilla-core's ``save_checkpoint``/``load_checkpoint``
(reference ``utils/solver.py:64-68``, ``train.py:87-93``) with Orbax, and the
surgical PoseNetGT -> IST-Net weight transplant (``train.py:103-118``: load
only ``pts_gt_extractor.*`` keys, rename to ``world_enhancer.extractor.*``,
``strict=False``) with a pytree-path remap.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import orbax.checkpoint as ocp

PyTree = Any


def _mgr(ckpt_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir))


def save_checkpoint(ckpt_dir: str, epoch: int, state, extra_meta: dict | None = None) -> None:
    """Save {params, batch_stats, opt_state, step} under epoch number."""
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "meta": {"epoch": epoch, **(extra_meta or {})},
    }
    with _mgr(ckpt_dir) as mgr:
        mgr.save(epoch, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()


def latest_epoch(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    with _mgr(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, epoch: int, template: PyTree) -> PyTree:
    """Restore with a structure template (abstract arrays ok)."""
    with _mgr(ckpt_dir) as mgr:
        return mgr.restore(epoch, args=ocp.args.StandardRestore(template))


def restore_checkpoint_sharded(ckpt_dir: str, epoch: int, state,
                               shardings) -> tuple[Any, dict]:
    """Restore a TrainState directly into sharded jax.Arrays (FSDP resume).

    ``state`` is a TrainState-shaped template (host numpy or device arrays —
    only shapes/dtypes are read); ``shardings`` a matching tree of
    NamedShardings (``parallel.state_shardings_fsdp``). Orbax reads each
    process's shards only — no host-RAM-sized gather, the multi-host-safe
    path (a plain ``restore_checkpoint`` materializes every array fully on
    every host). Returns ``(sharded_state, meta)``.
    """
    def abstract(x, s):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)

    # the meta subtree's keys are save-time data ({"epoch", **extra_meta},
    # save_checkpoint above) — a hardcoded {"epoch": 0} template would fail
    # Orbax structure matching for checkpoints saved with extra_meta, so
    # build it from the checkpoint's own tree metadata
    meta_template: dict = {"epoch": 0}
    try:
        with ocp.CheckpointManager(
                os.path.abspath(ckpt_dir),
                item_handlers=ocp.StandardCheckpointHandler()) as md_mgr:
            md_tree = md_mgr.item_metadata(epoch).tree["meta"]
        import numpy as np
        # python scalars: Orbax's StandardRestore rejects np scalar leaves
        meta_template = jax.tree_util.tree_map(
            lambda m: np.zeros((), m.dtype).item() if getattr(m, "dtype", None)
            is not None else 0, md_tree)
    except Exception:
        pass  # old/unreadable metadata: fall back to the minimal template

    template = {
        "params": jax.tree_util.tree_map(abstract, state.params,
                                         shardings.params),
        "batch_stats": jax.tree_util.tree_map(abstract, state.batch_stats,
                                              shardings.batch_stats),
        "opt_state": jax.tree_util.tree_map(abstract, state.opt_state,
                                            shardings.opt_state),
        "step": abstract(state.step, shardings.step),
        "meta": meta_template,
    }
    with _mgr(ckpt_dir) as mgr:
        payload = mgr.restore(epoch, args=ocp.args.StandardRestore(template))
    new_state = state.replace(
        step=payload["step"], params=payload["params"],
        batch_stats=payload["batch_stats"], opt_state=payload["opt_state"])
    return new_state, payload["meta"]


def restore_for_eval(ckpt_dir: str, epoch: int) -> dict:
    """Restore params + batch_stats without a template (for test/bench CLIs)."""
    with _mgr(ckpt_dir) as mgr:
        payload = mgr.restore(epoch)
    return payload


def load_world_enhancer(posenet_ckpt_dir: str, epoch: int,
                        params: PyTree, batch_stats: PyTree) -> tuple[PyTree, PyTree]:
    """Transplant PoseNetGT's ``pts_gt_extractor`` into IST-Net's
    ``world_enhancer/extractor`` (params AND BN running stats).

    The reference only remaps weights (train.py:106-114) — but since torch
    state_dicts carry running stats, its load moves BN stats too; we match by
    remapping both collections.

    ``posenet_ckpt_dir`` may also be a reference-trained torch ``.pth`` (or a
    pre-converted ``.npz``) — converted via ``cli/convert_torch_istnet``;
    ``epoch`` is ignored for those.
    """
    if posenet_ckpt_dir.endswith(".npz"):
        from istnet_tpu.cli import convert_torch_istnet as convert
        payload = convert.load_npz(posenet_ckpt_dir)
    elif posenet_ckpt_dir.endswith((".pth", ".pt")):
        from istnet_tpu.cli import convert_torch_istnet as convert
        payload = convert.convert_file(posenet_ckpt_dir, "posenet_gt")
    else:
        with _mgr(posenet_ckpt_dir) as mgr:
            payload = mgr.restore(epoch)
    src_params = payload["params"]["pts_gt_extractor"]
    src_stats = payload["batch_stats"]["pts_gt_extractor"]

    params = dict(params)
    we = dict(params["world_enhancer"])
    we["extractor"] = jax.tree_util.tree_map(lambda x: x, src_params)
    params["world_enhancer"] = we

    batch_stats = dict(batch_stats)
    wes = dict(batch_stats["world_enhancer"])
    wes["extractor"] = jax.tree_util.tree_map(lambda x: x, src_stats)
    batch_stats["world_enhancer"] = wes
    return params, batch_stats
