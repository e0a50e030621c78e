"""Test-time inference loop: per-image instance batches -> result pkls.

Rebuild of the reference ``utils/solver.py:217-317`` (``test_func``), with one
TPU-native change: images have variable instance counts (``dataset.py:380-413``),
so instance batches are padded to static bucket sizes (powers of two up to
``max_bucket``) — XLA compiles once per bucket instead of once per count, and
padded rows are dropped before saving. Pose assembly matches ``solver.py:231-241``:
``scale = ||size||``, ``RT[:3,:3] = R * scale``, ``RT[:3,3] = t``,
``scales = size / scale``.
"""

from __future__ import annotations

import functools
import os
import pickle

import jax
import numpy as np

Array = jax.Array


def _bucket(n: int, max_bucket: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_bucket)


def pad_instances(inputs: dict, bucket: int) -> dict:
    """Pad the instance axis to ``bucket`` by repeating row 0."""
    out = {}
    n = inputs["pts"].shape[0]
    for k, v in inputs.items():
        if n < bucket:
            pad = np.repeat(v[:1], bucket - n, axis=0)
            v = np.concatenate([v, pad], axis=0)
        out[k] = v
    return out


def assemble_pose(pred_rotation: np.ndarray, pred_translation: np.ndarray,
                  pred_size: np.ndarray):
    """(R, t, size) -> (pred_RTs (N,4,4), pred_scales (N,3)) (solver.py:231-241)."""
    scale = np.linalg.norm(pred_size, axis=1, keepdims=True)
    pred_scales = pred_size / scale
    n = pred_rotation.shape[0]
    rts = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    rts[:, :3, :3] = pred_rotation * scale[:, :, None]
    rts[:, :3, 3] = pred_translation
    return rts, pred_scales


class _DrainQueue:
    """Deferred D2H drain for the inference loops.

    Materializing ``np.asarray(end_points[...])`` right after each forward
    forces a device sync per image/flush — through the tunneled TPU backend
    that is ~30 ms of pure latency each, and it serializes host prefetch /
    pickling against device inference. Instead each loop enqueues a closure
    that does its own materialize-and-write, and the queue drains the OLDEST
    one only when more than ``depth`` are in flight (same double buffering
    as the train Solver's pipelined metric drain)."""

    def __init__(self, depth: int = 2):
        self.depth = depth
        self._q: list = []

    def push(self, finish) -> None:
        self._q.append(finish)
        while len(self._q) > self.depth:
            self._q.pop(0)()

    def flush(self) -> None:
        while self._q:
            self._q.pop(0)()


def _prefetch(dataset, n_workers: int = 2, depth: int = 4):
    """Yield dataset[i] in order with background-thread preprocessing.

    The per-image host work (depth decode + morphological fill + crops,
    ~25 ms+) otherwise serializes with device inference; the reference gets
    the same overlap from DataLoader workers (test.py:101-108).
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    n = len(dataset)
    with ThreadPoolExecutor(n_workers) as pool:
        window: deque = deque()
        nxt = 0
        while nxt < min(depth, n):
            window.append(pool.submit(dataset.__getitem__, nxt))
            nxt += 1
        while window:
            item = window.popleft().result()
            if nxt < n:  # sliding window bounds in-flight results
                window.append(pool.submit(dataset.__getitem__, nxt))
                nxt += 1
            yield item


def make_device_forward(model, variables, intrinsics, img_size: int = 192,
                        sample_num: int = 1024):
    """Build a jitted fn: raw image + instance masks -> end_points, with ALL
    preprocessing (depth completion, crop, sampling, backprojection, resize)
    fused into the same device program as the model forward.

    Returns fn(rgb_full u8 (H,W,3), depth_raw f32 (H,W), masks (K,H,W) bool,
    bboxes (K,4), category (K,), key) -> (end_points, n_valid (K,)).
    """
    import jax
    import jax.numpy as jnp

    from istnet_tpu.data.device_preprocess import (
        fill_missing_tpu, preprocess_shared_image_tpu)

    intr = jnp.asarray(intrinsics, jnp.float32)

    @jax.jit
    def fn(rgb_full, depth_raw, masks, bboxes, category, key):
        filled = fill_missing_tpu(depth_raw[None])[0]
        pre = preprocess_shared_image_tpu(
            rgb_full, filled, masks, bboxes, intr, key,
            img_size=img_size, sample_num=sample_num)
        inputs = {"rgb": pre["rgb"], "pts": pre["pts"], "choose": pre["choose"],
                  "category_label": category.astype(jnp.int32)}
        return model.apply(variables, inputs, train=False), pre["n_valid"]

    return fn


def test_func_device(device_forward, dataset, save_path: str, logger=None,
                     max_bucket: int = 64, progress: bool = True,
                     min_points: int = 16, seed: int = 0) -> None:
    """Device-pipeline variant of ``test_func``: the dataset yields raw
    arrays (``TestDataset(device_preprocess=True)``); instances with <=
    ``min_points`` valid pixels are dropped AFTER the device pass (the
    reference's >16 check, ``dataset.py:387``)."""
    import jax

    os.makedirs(save_path, exist_ok=True)
    it = _prefetch(dataset, n_workers=2)
    if progress:
        try:
            from tqdm import tqdm
            it = tqdm(it, total=len(dataset))
        except Exception:
            pass

    dq = _DrainQueue()
    key = jax.random.PRNGKey(seed)
    for i, data in enumerate(it):
        path = dataset.result_pkl_list[i]
        gt = data["gt"]
        result = {
            "gt_class_ids": np.asarray(gt["gt_class_ids"]),
            "gt_bboxes": np.asarray(gt["gt_bboxes"]),
            "gt_RTs": np.asarray(gt["gt_RTs"]),
            "gt_scales": np.asarray(gt["gt_scales"]),
            "gt_handle_visibility": np.asarray(gt["gt_handle_visibility"]),
        }
        out = os.path.join(save_path, os.path.basename(path))
        k = data["masks"].shape[0] if "masks" in data else 0
        if data.get("empty", False) or k == 0:
            keep = np.zeros(len(np.asarray(gt["pred_class_ids"])), bool)
            result["pred_class_ids"] = np.asarray(gt["pred_class_ids"])[keep]
            result["pred_bboxes"] = np.asarray(gt["pred_bboxes"])[keep]
            result["pred_scores"] = np.asarray(gt["pred_scores"])[keep]
            result["pred_RTs"] = np.zeros((0, 4, 4), np.float32)
            result["pred_scales"] = np.zeros((0, 3), np.float32)
            with open(out, "wb") as f:
                pickle.dump(result, f)
            continue

        bucket = _bucket(k, max_bucket)
        masks = data["masks"]
        bboxes = data["bboxes"]
        category = data["category_label"]
        if k < bucket:  # pad with empty masks -> n_valid 0 -> dropped
            masks = np.concatenate(
                [masks, np.zeros((bucket - k,) + masks.shape[1:], bool)])
            bboxes = np.concatenate(
                [bboxes, np.tile(bboxes[-1:], (bucket - k, 1))])
            category = np.concatenate(
                [category, np.zeros(bucket - k, category.dtype)])
        key, sub = jax.random.split(key)
        end_points, n_valid = device_forward(
            data["rgb_full"], data["depth_raw"], masks, bboxes, category, sub)
        ep = {name: end_points[name] for name in
              ("pred_rotation", "pred_translation", "pred_size")}

        def finish(result=result, gt=gt, ep=ep, n_valid=n_valid, k=k, out=out):
            keep = np.asarray(n_valid)[:k] > min_points
            result["pred_class_ids"] = np.asarray(gt["pred_class_ids"])[keep]
            result["pred_bboxes"] = np.asarray(gt["pred_bboxes"])[keep]
            result["pred_scores"] = np.asarray(gt["pred_scores"])[keep]
            if keep.any():
                r = np.asarray(ep["pred_rotation"])[:k][keep]
                t = np.asarray(ep["pred_translation"])[:k][keep]
                s = np.asarray(ep["pred_size"])[:k][keep]
                result["pred_RTs"], result["pred_scales"] = assemble_pose(r, t, s)
            else:
                result["pred_RTs"] = np.zeros((0, 4, 4), np.float32)
                result["pred_scales"] = np.zeros((0, 3), np.float32)
            with open(out, "wb") as f:
                pickle.dump(result, f)

        dq.push(finish)
    dq.flush()


def make_device_batched(model, variables, intrinsics, img_size: int = 192,
                        sample_num: int = 1024, batch_size: int = 64,
                        kb: int = 16, lag: int = 2, min_points: int = 16,
                        mesh=None):
    """Device-side streaming compaction: compose the fused device
    preprocessing with cross-image instance batching (VERDICT r4 item 4 —
    ``test_func_device`` ran one forward per image at bucket sizes while
    ``test_func_batched`` needed host preprocessing; here preprocessed
    instances never leave the device between the two stages).

    Three jitted programs over STATIC shapes:

    - ``append(buffers, pos, raw image chunk, key)``: depth fill + shared
      crop/sample/backproject for ``kb`` instance masks
      (``preprocess_shared_image_tpu``), then a compacting scatter of the
      instances with > ``min_points`` valid pixels (the reference's
      ``dataset.py:387`` check, applied ON DEVICE) into ``buffers`` at the
      device cursor ``pos``; invalid rows scatter to a trash slot.
    - ``forward(buffers, pos)``: the model eval forward on ``buffers[:B]``,
      then the overflow region ``[B:BUF)`` shifts to the front and the
      cursor drops by B.

    The buffer holds ``BUF = B + (lag+1)*kb + 1`` rows: the host learns each
    chunk's valid count with up to ``lag`` chunks of delay (async D2H — no
    per-image sync), so up to ``lag+1`` undecided chunks may append before a
    flush is triggered; the overflow region absorbs them and the final ``+1``
    is the trash slot.

    Returns ``(init_buffers, append, forward)``.
    """
    import jax
    import jax.numpy as jnp

    from istnet_tpu.data.device_preprocess import (
        fill_missing_tpu, preprocess_shared_image_tpu)

    intr = jnp.asarray(intrinsics, jnp.float32)
    buf_n = batch_size + (lag + 1) * kb + 1
    trash = buf_n - 1

    # ``mesh``: data-parallel eval over a 1-D mesh — buffer rows (and the
    # model forward's instance batch) shard over DATA_AXIS, weights
    # replicate; the per-image preprocess shards over the kb instance axis.
    # The scatter into the row-sharded buffer is GSPMD's to place.
    constrain = lambda t, spec=None: t
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        from istnet_tpu.parallel.mesh import DATA_AXIS
        if batch_size % mesh.devices.size:
            raise ValueError(f"eval batch {batch_size} must divide by the "
                             f"{mesh.devices.size}-device mesh")
        _row = NamedSharding(mesh, P(DATA_AXIS))

        def constrain(t, spec=None):
            return jax.lax.with_sharding_constraint(t, _row)

        variables = jax.device_put(variables, NamedSharding(mesh, P()))

    def init_buffers():
        bufs = {
            "rgb": jnp.zeros((buf_n, img_size, img_size, 3), jnp.float32),
            "pts": jnp.zeros((buf_n, sample_num, 3), jnp.float32),
            "choose": jnp.zeros((buf_n, sample_num), jnp.int32),
            "category_label": jnp.zeros((buf_n,), jnp.int32),
        }
        if mesh is not None:
            bufs = jax.jit(lambda b: {k: constrain(v) for k, v in b.items()}
                           )(bufs)
        return bufs, jnp.zeros((), jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def append(buffers, pos, rgb_full, depth_raw, masks, bboxes,
               category, key):
        # REJECTED A/B (round 5): shipping masks bit-packed (np.packbits,
        # 8x fewer H2D bytes) + depth as u16 mm, unpacked on device —
        # eval_bench device_batched 1.86 -> 1.71 img/s in this environment:
        # the loop is HOST-decode-bound (3 PNG decodes/image on one core,
        # ~0.5 s/img), so shrinking uploads only added host pack work; on a
        # real PCIe host bytes are even less binding. Plain arrays kept.
        filled = fill_missing_tpu(depth_raw[None])[0]
        pre = preprocess_shared_image_tpu(
            rgb_full, filled, masks, bboxes, intr, key,
            img_size=img_size, sample_num=sample_num)
        valid = pre["n_valid"] > min_points                     # (kb,)
        dst = jnp.where(valid, pos + jnp.cumsum(valid) - 1, trash)
        chunk = {"rgb": pre["rgb"], "pts": pre["pts"], "choose": pre["choose"],
                 "category_label": category.astype(jnp.int32)}
        buffers = {k: constrain(
            buffers[k].at[dst].set(chunk[k].astype(buffers[k].dtype)))
            for k in buffers}
        return buffers, pos + valid.sum(dtype=jnp.int32), pre["n_valid"]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def forward(buffers, pos):
        inputs = {k: constrain(v[:batch_size]) for k, v in buffers.items()}
        ep = model.apply(variables, inputs, train=False)
        ep = {k: ep[k] for k in
              ("pred_rotation", "pred_translation", "pred_size")}
        buffers = {k: constrain(v.at[: buf_n - batch_size].set(v[batch_size:]))
                   for k, v in buffers.items()}
        return ep, buffers, pos - batch_size

    return init_buffers, append, forward


def test_func_device_batched(model, variables, dataset, save_path: str,
                             intrinsics, img_size: int = 192,
                             sample_num: int = 1024, batch_size: int = 64,
                             kb: int = 16, min_points: int = 16, lag: int = 2,
                             logger=None, progress: bool = True,
                             seed: int = 0, mesh=None) -> None:
    """Fully-fused device pipeline WITH cross-image instance batching: the
    dataset yields raw arrays (``TestDataset(device_preprocess=True)``); the
    model runs once per ``batch_size`` valid instances across images instead
    of once per image. Same result pkls as ``test_func``/``test_func_device``.

    Host bookkeeping: valid instances get consecutive global sequence
    numbers in device scatter order, so instance ``seq`` comes back as row
    ``seq % batch_size`` of flush ``seq // batch_size`` — the host never
    needs to know buffer positions, only each chunk's ``n_valid`` (read with
    an async lag of ``lag`` chunks to avoid per-image syncs).
    """
    import jax

    os.makedirs(save_path, exist_ok=True)
    it = _prefetch(dataset, n_workers=2)
    if progress:
        try:
            from tqdm import tqdm
            it = tqdm(it, total=len(dataset))
        except Exception:
            pass

    init_buffers, append, forward = make_device_batched(
        model, variables, intrinsics, img_size=img_size,
        sample_num=sample_num, batch_size=batch_size, kb=kb, lag=lag,
        min_points=min_points, mesh=mesh)
    buffers, pos = init_buffers()
    key = jax.random.PRNGKey(seed)

    dq = _DrainQueue()
    img_state: dict[int, dict] = {}     # image idx -> assembly state
    chunk_q: list = []                  # undecided (img_idx, chunk_lo, n_valid_dev)
    flush_eps: list = []                # per-flush ep dict (drained lazily)
    n_flushed = 0                       # flushes dispatched
    seq = 0                             # next global sequence number [host view]

    def _write(i: int) -> None:
        st = img_state.pop(i)
        result = st["result"]
        if st["rows"]:
            preds = []
            for s in st["rows"]:
                f, r = divmod(s, batch_size)
                ep = flush_eps[f]
                preds.append((np.asarray(ep["pred_rotation"])[r],
                              np.asarray(ep["pred_translation"])[r],
                              np.asarray(ep["pred_size"])[r]))
            r = np.stack([p[0] for p in preds])
            t = np.stack([p[1] for p in preds])
            s_ = np.stack([p[2] for p in preds])
            result["pred_RTs"], result["pred_scales"] = assemble_pose(r, t, s_)
        else:
            result["pred_RTs"] = np.zeros((0, 4, 4), np.float32)
            result["pred_scales"] = np.zeros((0, 3), np.float32)
        path = dataset.result_pkl_list[st["index"]]
        with open(os.path.join(save_path, os.path.basename(path)), "wb") as f:
            pickle.dump(result, f)

    def _resolve_chunk() -> None:
        """Materialize the oldest chunk's n_valid; assign sequence numbers."""
        nonlocal seq, buffers, pos, n_flushed
        i, lo, nv_dev = chunk_q.pop(0)
        nv = np.asarray(nv_dev)
        st = img_state[i]
        for j, v in enumerate(nv):
            orig = lo + j
            if orig >= st["k"]:
                continue                      # mask padding row
            keep = v > min_points
            st["keep"][orig] = keep
            if keep:
                st["rows"].append(seq)
                seq += 1
        st["chunks_left"] -= 1
        while seq - n_flushed * batch_size >= batch_size:
            ep, buffers, pos = forward(buffers, pos)
            flush_eps.append(ep)
            n_flushed += 1
        if st["chunks_left"] == 0:
            st["ready"] = True
            _maybe_finish()

    def _maybe_finish() -> None:
        """Write images (in order) whose rows all live in dispatched flushes."""
        for i in sorted(list(img_state)):
            st = img_state[i]
            if st.get("queued"):
                continue            # pushed, awaiting its deferred _write
            if not st["ready"]:
                break
            if st["rows"] and st["rows"][-1] >= n_flushed * batch_size:
                break
            st["queued"] = True
            keep = np.asarray([st["keep"][j] for j in range(st["k"])], bool)
            gt = st["gt"]
            st["result"]["pred_class_ids"] = np.asarray(gt["pred_class_ids"])[keep]
            st["result"]["pred_bboxes"] = np.asarray(gt["pred_bboxes"])[keep]
            st["result"]["pred_scores"] = np.asarray(gt["pred_scores"])[keep]
            dq.push(lambda i=i: _write(i))

    for i, data in enumerate(it):
        gt = data["gt"]
        result = {
            "gt_class_ids": np.asarray(gt["gt_class_ids"]),
            "gt_bboxes": np.asarray(gt["gt_bboxes"]),
            "gt_RTs": np.asarray(gt["gt_RTs"]),
            "gt_scales": np.asarray(gt["gt_scales"]),
            "gt_handle_visibility": np.asarray(gt["gt_handle_visibility"]),
        }
        k = 0 if data.get("empty", False) else data["masks"].shape[0]
        n_chunks = max((k + kb - 1) // kb, 0)
        img_state[i] = {"index": i, "result": result, "gt": gt, "k": k,
                        "rows": [], "keep": {}, "chunks_left": n_chunks,
                        "ready": n_chunks == 0}
        if k == 0:
            for kk in ("pred_class_ids", "pred_bboxes", "pred_scores"):
                img_state[i]["result"][kk] = np.asarray(gt[kk])[:0]
            _maybe_finish()
            continue
        for lo in range(0, k, kb):
            hi = min(lo + kb, k)
            masks = data["masks"][lo:hi]
            bboxes = data["bboxes"][lo:hi]
            category = data["category_label"][lo:hi]
            if hi - lo < kb:  # pad with empty masks -> n_valid 0 -> dropped
                pad = kb - (hi - lo)
                masks = np.concatenate(
                    [masks, np.zeros((pad,) + masks.shape[1:], masks.dtype)])
                bboxes = np.concatenate([bboxes, np.tile(bboxes[-1:], (pad, 1))])
                category = np.concatenate(
                    [category, np.zeros(pad, category.dtype)])
            key, sub = jax.random.split(key)
            buffers, pos, n_valid = append(
                buffers, pos, data["rgb_full"], data["depth_raw"],
                masks, bboxes, category, sub)
            try:
                n_valid.copy_to_host_async()
            except Exception:
                pass
            chunk_q.append((i, lo, n_valid))
            while len(chunk_q) > lag:
                _resolve_chunk()
    while chunk_q:
        _resolve_chunk()
    if seq > n_flushed * batch_size:        # remainder flush (partial batch)
        ep, buffers, pos = forward(buffers, pos)
        flush_eps.append(ep)
        n_flushed += 1
    _maybe_finish()
    dq.flush()
    assert not img_state, f"unfinished images: {sorted(img_state)}"


def test_func_batched(forward, dataset, save_path: str, logger=None,
                      batch_size: int = 64, progress: bool = True,
                      prefetch_workers: int = 4) -> None:
    """Cross-image instance batching: ONE compiled shape, full device batches.

    ``test_func`` pads each image's instances to a power-of-2 bucket (a
    compile per bucket, small batches); here instances stream from the
    prefetched images into a fixed ``batch_size`` buffer, the forward runs
    once per full buffer, and results scatter back to their images (written
    in order as they complete). The remainder batch pads by repeating its
    last instance. Same result pkls as ``test_func``; REAL275's ~2750 images
    x ~5 instances become ~215 forwards at batch 64 instead of 2750.
    """
    os.makedirs(save_path, exist_ok=True)
    it = _prefetch(dataset, n_workers=prefetch_workers)
    if progress:
        try:
            from tqdm import tqdm
            it = tqdm(it, total=len(dataset))
        except Exception:
            pass

    dq = _DrainQueue()
    pending_inputs: list[dict] = []  # one entry per queued instance
    pending_img: list[int] = []      # owning image index per queued instance
    img_state: dict[int, dict] = {}  # image index -> result assembly state

    def flush(n_take: int) -> None:
        """Run the forward on the first n_take queued instances."""
        take = pending_inputs[:n_take]
        owners = pending_img[:n_take]
        del pending_inputs[:n_take], pending_img[:n_take]
        stacked = {k: np.stack([inst[k] for inst in take])
                   for k in ("rgb", "pts", "choose", "category_label")}
        if n_take < batch_size:  # remainder: pad to the one compiled shape
            reps = batch_size - n_take
            for k, v in stacked.items():
                stacked[k] = np.concatenate([v, np.repeat(v[-1:], reps, axis=0)])
        end_points = forward(stacked)
        ep = {k: end_points[k] for k in
              ("pred_rotation", "pred_translation", "pred_size")}

        def finish(ep=ep, owners=owners, n_take=n_take):
            r = np.asarray(ep["pred_rotation"])[:n_take]
            t = np.asarray(ep["pred_translation"])[:n_take]
            s = np.asarray(ep["pred_size"])[:n_take]
            for j, owner in enumerate(owners):
                img_state[owner]["preds"].append((r[j], t[j], s[j]))
            for owner in sorted(set(owners)):
                st = img_state[owner]
                if len(st["preds"]) == st["n_expected"]:
                    _write(owner)

        dq.push(finish)

    def _write(owner: int) -> None:
        st = img_state.pop(owner)
        result = st["result"]
        if st["preds"]:
            r = np.stack([p[0] for p in st["preds"]])
            t = np.stack([p[1] for p in st["preds"]])
            s = np.stack([p[2] for p in st["preds"]])
            result["pred_RTs"], result["pred_scales"] = assemble_pose(r, t, s)
        else:
            result["pred_RTs"] = np.zeros((0, 4, 4), np.float32)
            result["pred_scales"] = np.zeros((0, 3), np.float32)
        path = dataset.result_pkl_list[st["index"]]
        with open(os.path.join(save_path, os.path.basename(path)), "wb") as f:
            pickle.dump(result, f)

    for i, data in enumerate(it):
        gt = data["gt"]
        flag = data["flag_instance"]
        result = {
            "gt_class_ids": np.asarray(gt["gt_class_ids"]),
            "gt_bboxes": np.asarray(gt["gt_bboxes"]),
            "gt_RTs": np.asarray(gt["gt_RTs"]),
            "gt_scales": np.asarray(gt["gt_scales"]),
            "gt_handle_visibility": np.asarray(gt["gt_handle_visibility"]),
            "pred_class_ids": np.asarray(gt["pred_class_ids"])[flag],
            "pred_bboxes": np.asarray(gt["pred_bboxes"])[flag],
            "pred_scores": np.asarray(gt["pred_scores"])[flag],
        }
        n = 0 if data.get("empty", False) else data["pts"].shape[0]
        img_state[i] = {"index": i, "result": result, "preds": [], "n_expected": n}
        if n == 0:
            _write(i)
            continue
        for j in range(n):
            pending_inputs.append({
                "rgb": data["rgb"][j], "pts": data["pts"][j],
                "choose": data["choose"][j],
                "category_label": data["category_label"][j]})
            pending_img.append(i)
        while len(pending_inputs) >= batch_size:
            flush(batch_size)
    if pending_inputs:
        flush(len(pending_inputs))
    dq.flush()
    assert not img_state, f"unfinished images: {sorted(img_state)}"


def test_func(forward, dataset, save_path: str, logger=None,
              max_bucket: int = 64, progress: bool = True,
              prefetch_workers: int = 2) -> None:
    """Run inference over a TestDataset and dump per-image result pkls.

    ``forward(inputs) -> end_points`` must be a jitted eval forward taking
    numpy/jax arrays (instance-batched). Results feed ``eval.nocs_map.evaluate``.
    """
    os.makedirs(save_path, exist_ok=True)
    dq = _DrainQueue()
    it = _prefetch(dataset, n_workers=prefetch_workers)
    if progress:
        try:
            from tqdm import tqdm
            it = tqdm(it, total=len(dataset))
        except Exception:
            pass

    for i, data in enumerate(it):
        path = dataset.result_pkl_list[i]
        gt = data["gt"]
        result = {
            "gt_class_ids": np.asarray(gt["gt_class_ids"]),
            "gt_bboxes": np.asarray(gt["gt_bboxes"]),
            "gt_RTs": np.asarray(gt["gt_RTs"]),
            "gt_scales": np.asarray(gt["gt_scales"]),
            "gt_handle_visibility": np.asarray(gt["gt_handle_visibility"]),
        }
        flag = data["flag_instance"]
        result["pred_class_ids"] = np.asarray(gt["pred_class_ids"])[flag]
        result["pred_bboxes"] = np.asarray(gt["pred_bboxes"])[flag]
        result["pred_scores"] = np.asarray(gt["pred_scores"])[flag]

        out = os.path.join(save_path, os.path.basename(path))
        if data.get("empty", False):
            result["pred_RTs"] = np.zeros((0, 4, 4), np.float32)
            result["pred_scales"] = np.zeros((0, 3), np.float32)
            with open(out, "wb") as f:
                pickle.dump(result, f)
            continue

        n = data["pts"].shape[0]
        bucket = _bucket(n, max_bucket)
        inputs = pad_instances(
            {"rgb": data["rgb"], "pts": data["pts"], "choose": data["choose"],
             "category_label": data["category_label"]}, bucket)
        end_points = forward(inputs)
        ep = {k: end_points[k] for k in
              ("pred_rotation", "pred_translation", "pred_size")}

        def finish(result=result, ep=ep, n=n, out=out):
            r = np.asarray(ep["pred_rotation"])[:n]
            t = np.asarray(ep["pred_translation"])[:n]
            s = np.asarray(ep["pred_size"])[:n]
            result["pred_RTs"], result["pred_scales"] = assemble_pose(r, t, s)
            with open(out, "wb") as f:
                pickle.dump(result, f)

        dq.push(finish)
    dq.flush()
