"""Training solver: epoch loop over mixed syn+real batches.

Rebuild of the reference ``utils/solver.py:19-215`` on the functional train
step: zip the CAMERA (syn) and REAL loaders, concatenate each pair of batches
(``solver.py:163-174``), run one jitted train step (the reference's
per-subset weighted loss equals the concatenated-batch loss — every term is a
batch mean), log running averages every ``per_write`` iters, checkpoint every
5 epochs with resume metadata.

Parallelism is config-driven (the reference wires its one strategy into the
entry point, ``train.py:98-99``; this is the TPU-native ladder):

- default: 1-D data-parallel mesh, state replicated, batch sharded;
- ``parallel: {fsdp: N [, dp: M]}``: 2-D (dp, fsdp) mesh, params/optimizer
  state ZeRO-3-sharded over ``fsdp``, batch data-parallel over both axes,
  checkpoints saved as sharded jax.Arrays;
- multi-host (``jax.process_count() > 1`` after ``multihost.initialize``):
  each host's loaders carry 1/n_proc of the global batch, assembled via
  ``multihost.global_batch``; works under both layouts.
"""

from __future__ import annotations

import time

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from istnet_tpu.parallel import (
    jit_train_step_dp, jit_train_step_fsdp, make_mesh, make_mesh_2d,
    replicate, shard_state_fsdp, state_shardings_fsdp)
from istnet_tpu.parallel import multihost
from istnet_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS
from istnet_tpu.train import checkpoints
from istnet_tpu.train.train_state import TrainState, create_train_state, make_train_step
from istnet_tpu.utils.logging import LogBuffer, MetricWriter

LABEL_KEYS = ("rotation_label", "translation_label", "size_label", "qo")
INPUT_KEYS = ("rgb", "pts", "choose", "category_label", "qo", "sym_info")


def split_batch(np_batch: dict) -> dict:
    """numpy collated batch -> {'inputs': ..., 'labels': ...} for the step fn."""
    inputs = {k: np_batch[k] for k in INPUT_KEYS if k in np_batch}
    labels = {k: np_batch[k] for k in LABEL_KEYS if k in np_batch}
    return {"inputs": inputs, "labels": labels}


def concat_batches(a: dict, b: dict) -> dict:
    return {k: np.concatenate([a[k], b[k]], axis=0)
            for k in a if isinstance(a[k], np.ndarray)}


class Solver:
    def __init__(self, model, loss_fn, tx, cfg, variables,
                 syn_loader=None, real_loader=None, logger=None,
                 log_dir: str | None = None, start_epoch: int = 1,
                 start_state: TrainState | None = None,
                 n_devices: int | None = None,
                 resume_sharded: tuple[str, int] | None = None):
        self.model = model
        self.cfg = cfg
        self.logger = logger
        self.syn_loader = syn_loader
        self.real_loader = real_loader
        self.log_buffer = LogBuffer()
        self.writer = MetricWriter(log_dir)
        self.log_dir = log_dir
        self.per_write = int(cfg.get("per_write", 50))
        # host runs this many steps ahead before draining metrics (per-iter
        # D2H sync costs ~30 ms through the tunneled backend); bounds
        # in-flight batch memory to depth * global-batch bytes
        self.pipeline_depth = int(cfg.get("pipeline_depth", 2))
        self.max_epoch = int(cfg.max_epoch)
        self.iters_per_epoch = int(cfg.get("num_mini_batch_per_epoch", 4000))
        self.start_epoch = start_epoch

        # ---- parallel layout ------------------------------------------
        # config key ``parallel: {fsdp: N [, dp: M]}`` selects a 2-D
        # (dp, fsdp) mesh with ZeRO-3 parameter/optimizer-state sharding;
        # default is the 1-D DP mesh (the reference's DataParallel
        # equivalent, train.py:98-99). Multi-process (pod) runs are
        # detected from jax.process_count(): the loaders then carry only
        # THIS host's shard of the global batch (cli.train divides the
        # config's global batch sizes per host).
        par = cfg.get("parallel", {}) or {}
        self.fsdp = int(par.get("fsdp", 1))
        self.n_proc = jax.process_count()
        local_bs = sum(l.batch_size for l in (syn_loader, real_loader)
                       if l is not None) or 1
        global_bs = local_bs * self.n_proc
        if self.fsdp > 1:
            dp = int(par.get("dp", 0)) or jax.device_count() // self.fsdp
            if dp < 1:
                raise ValueError(
                    f"parallel.fsdp = {self.fsdp} exceeds the "
                    f"{jax.device_count()} available devices (dp computes to "
                    f"{dp}); use fsdp <= device_count")
            if dp * self.fsdp != jax.device_count():
                if self.n_proc > 1:
                    raise ValueError(
                        f"multi-process mesh must cover all devices: dp*fsdp = "
                        f"{dp * self.fsdp} != {jax.device_count()}")
                # single-process: a partial mesh is legal (like --devices N on
                # the DP path) but must never be silent
                if logger is not None:
                    logger.info(
                        f"partial FSDP mesh: dp*fsdp = {dp * self.fsdp} uses "
                        f"{dp * self.fsdp}/{jax.device_count()} devices")
            if global_bs % (dp * self.fsdp):
                raise ValueError(
                    f"global batch {global_bs} not divisible by mesh size "
                    f"{dp}x{self.fsdp}")
            self.mesh = make_mesh_2d(dp, self.fsdp)
            if logger is not None:
                logger.info(f"parallel: FSDP mesh dp={dp} fsdp={self.fsdp} "
                            f"({self.n_proc} process(es))")
        else:
            # mesh size must divide the global batch (batch dim is sharded);
            # single-process runs shrink to the largest usable device count
            nd = min(n_devices or jax.device_count(), jax.device_count())
            if self.n_proc > 1:
                if nd != jax.device_count() or global_bs % nd:
                    raise ValueError(
                        f"multi-process DP requires the global batch "
                        f"({global_bs}) divisible by ALL {jax.device_count()} "
                        "devices")
            else:
                while global_bs % nd:
                    nd -= 1
            if logger is not None and nd != jax.device_count():
                logger.info(f"using {nd}/{jax.device_count()} devices "
                            f"(global batch {global_bs})")
            self.mesh = make_mesh(nd)
        self._batch_spec = (P((DATA_AXIS, FSDP_AXIS)) if self.fsdp > 1
                            else P(DATA_AXIS))

        preprocess_fn = None
        td = cfg.get("train_dataset", {})
        self.device_preprocess = bool(td and td.get("use_device_preprocess", False))
        if self.device_preprocess:
            from istnet_tpu.data.device_preprocess import make_train_preprocess

            dl = cfg.get("train_dataloader", {})
            # NOTE: point jitter is clip(0.001*randn, +-0.005) with the 0.005
            # hardcoded, matching the reference (dataset.py:210 ignores its
            # own config shift_range) — don't wire config.shift_range here
            preprocess_fn = make_train_preprocess(
                img_size=int(td.get("img_size", 192)),
                sample_num=int(td.get("sample_num", 1024)),
                use_fill_miss=bool(dl.get("use_fill_miss", True)) if dl else True)

        augment_fn = None
        if td and td.get("use_device_aug", False):
            from istnet_tpu.data.device_augment import device_augment

            # only bb/rt exist on device (the augs the shipped configs enable);
            # refuse configs that would silently drop bc/pc/nl
            for k in ("aug_bc_pro", "aug_pc_pro", "aug_nl_pro"):
                if float(td.get(k, 0.0)) > 0.0:
                    raise ValueError(
                        f"use_device_aug supports only bb/rt augs; {k} > 0 "
                        "requires the host path (use_shape_aug)")

            def augment_fn(batch, rng, _td=td):
                return device_augment(batch, rng,
                                      aug_bb_pro=float(_td.get("aug_bb_pro", 0.3)),
                                      aug_rt_pro=float(_td.get("aug_rt_pro", 0.3)))

        step_fn = make_train_step(model, loss_fn, tx, cfg.bn, augment_fn=augment_fn,
                                  preprocess_fn=preprocess_fn)
        state = start_state or create_train_state(
            variables["params"], variables["batch_stats"], tx)
        if self.fsdp > 1:
            self.train_step = jit_train_step_fsdp(step_fn, self.mesh, state)
            if resume_sharded is not None:
                # the memory-safe resume for sharded runs: Orbax reads each
                # process's shards straight into the FSDP placement — no
                # host-RAM-sized full-state materialization per host (the
                # 1-D/replicated path restores via a host template in
                # cli/train.py instead)
                ckpt_dir, epoch = resume_sharded
                self.state, meta = checkpoints.restore_checkpoint_sharded(
                    ckpt_dir, epoch, state,
                    state_shardings_fsdp(self.mesh, state))
                self.start_epoch = int(meta["epoch"]) + 1
                self._log(f"resumed from epoch {epoch} (sharded restore)")
            else:
                self.state = shard_state_fsdp(self.mesh, state)
        else:
            if resume_sharded is not None:
                raise ValueError(
                    "resume_sharded requires an FSDP layout (parallel: "
                    "{fsdp: N}); replicated runs resume via a host-template "
                    "restore (cli/train.py)")
            self.train_step = jit_train_step_dp(step_fn, self.mesh)
            self.state = replicate(self.mesh, state)
        # replicated single-process state checkpoints as host numpy (cheap
        # gather); FSDP-sharded or multi-process state is handed to Orbax as
        # jax.Arrays — each host writes only its own shards, and a
        # jax.device_get would crash on non-addressable shards
        self._ckpt_device_get = (self.fsdp == 1 and self.n_proc == 1)
        # multi-process: the first collective of the first step EXECUTION
        # opens the gloo/ICI communicators, whose handshake timeout (30 s on
        # CPU gloo) is far shorter than possible per-process jit-compile skew
        # (minutes for the full model). AOT-compile + barrier before the
        # first execution bounds that skew (see multihost.barrier).
        self._needs_compile_barrier = self.n_proc > 1
        self.rng = jax.random.PRNGKey(int(cfg.get("rd_seed", 1)))

    def _log(self, msg: str) -> None:
        if self.logger is not None:
            self.logger.info(msg)
        else:
            print(msg)

    def solve(self) -> TrainState:
        for epoch in range(self.start_epoch, self.max_epoch + 1):
            self.train_epoch(epoch)
            if epoch % 5 == 0 and self.log_dir is not None:
                checkpoints.save_checkpoint(
                    f"{self.log_dir}/ckpt", epoch,
                    jax.device_get(self.state) if self._ckpt_device_get
                    else self.state)
                self._log(f"saved checkpoint at epoch {epoch}")
        return self.state

    def train_epoch(self, epoch: int) -> None:
        # epoch resampling (reference solver.py:80-81 -> dataset.reset())
        for loader in (self.syn_loader, self.real_loader):
            if loader is not None and getattr(loader.dataset, "num_img_per_epoch", -1) != -1:
                loader.dataset.reset()

        # the reference's epoch contract is EXACTLY num_mini_batch_per_epoch
        # iterations (solver.py:85, datasets resampled to 4000*bs images);
        # enforce it here instead of trusting loader sizing — a Solver user
        # with unsized datasets would otherwise silently get a different
        # epoch length. Fail fast on provably-short loaders; the end-of-epoch
        # warning below stays as a net for dynamic exhaustion (self-healing
        # datasets can shrink mid-epoch).
        for name, loader in (("syn", self.syn_loader), ("real", self.real_loader)):
            if loader is None:
                continue
            try:
                n = len(loader)
            except TypeError:
                continue
            if n < self.iters_per_epoch:
                raise ValueError(
                    f"{name} loader provides {n} batches but the epoch "
                    f"contract is {self.iters_per_epoch} iterations; size the "
                    "dataset with num_img_per_epoch = iters * batch (reference "
                    "solver.py:85)")
        import itertools
        iters = zip(self.syn_loader, self.real_loader) if self.real_loader else (
            (b, None) for b in self.syn_loader)
        iters = itertools.islice(iters, self.iters_per_epoch)
        # Pipelined metric drain: materializing metrics right after dispatch
        # (the reference reads loss.item() per iter, solver.py:104-108) would
        # force a D2H sync EVERY iteration — through the tunneled TPU backend
        # that is up to ~30 ms of pure latency per step, and it serializes
        # host dispatch against device execution. Instead the host runs up to
        # ``pipeline_depth`` steps ahead and drains the OLDEST step's metrics
        # (one sync) only when the window is full — classic double buffering:
        # sync latency overlaps device work, in-flight batches stay bounded.
        import collections
        inflight = collections.deque()  # (iter_idx, metrics, t_data, t_disp)

        def drain_one() -> None:
            i_, metrics_, t_data_, t_disp_ = inflight.popleft()
            vals = {k: float(v) for k, v in metrics_.items()}  # one sync
            self.log_buffer.update(
                {**vals, "T_data": t_data_, "T_dispatch": t_disp_,
                 "T_iter": (time.time() - self._win_t0) / (i_ + 1 - self._win_i0)})

        n_done = 0
        self._win_t0 = time.time()
        self._win_i0 = 0
        t_data0 = time.time()
        for i, (syn_np, real_np) in enumerate(iters):
            n_done = i + 1
            merged = concat_batches(syn_np, real_np) if real_np is not None else syn_np
            # raw-array mode ships the flat raw batch; the split into
            # inputs/labels happens on device inside preprocess_fn.
            # multihost.global_batch assembles the per-host shards into one
            # global batch-sharded jax.Array tree (single-process it is a
            # plain device_put under the same sharding)
            batch = multihost.global_batch(
                self.mesh,
                merged if self.device_preprocess else split_batch(merged),
                spec=self._batch_spec)
            t_data = time.time() - t_data0

            self.rng, sub = jax.random.split(self.rng)
            if self._needs_compile_barrier:
                # compile apart, execute together: replace the jitted step
                # with its AOT-compiled executable (same signature — shapes
                # are static for the whole run), then rendezvous so every
                # process opens the communicators within the gloo handshake
                # timeout instead of skewed by its own compile time
                self.train_step = self.train_step.lower(
                    self.state, batch, sub).compile()
                multihost.barrier("istnet_train_step_compiled")
                self._needs_compile_barrier = False
            t0 = time.time()
            self.state, metrics = self.train_step(self.state, batch, sub)
            inflight.append((i, metrics, t_data, time.time() - t0))
            while len(inflight) > self.pipeline_depth:
                drain_one()

            if (i + 1) % self.per_write == 0:
                while inflight:
                    drain_one()
                avg = self.log_buffer.average()
                step = int(jax.device_get(self.state.step))
                self._log(f"epoch {epoch} iter {i + 1}/{self.iters_per_epoch} "
                          + " ".join(f"{k}={v:.4f}" for k, v in sorted(avg.items())))
                self.writer.add_scalars("train/", avg, step)
                self.log_buffer.clear()
                self._win_t0 = time.time()
                self._win_i0 = i + 1
            t_data0 = time.time()
        while inflight:
            drain_one()
        if n_done < self.iters_per_epoch and self.logger is not None:
            self.logger.warning(
                f"epoch {epoch} ran {n_done}/{self.iters_per_epoch} iters — "
                "loaders exhausted early; size datasets with num_img_per_epoch "
                "= iters * batch to honor the reference epoch contract")
