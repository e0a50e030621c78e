"""Slow numpy golden models of the reference CUDA op semantics.

Literal, loop-based transcriptions of the algorithmic contracts in
``/root/reference/model/pointnet2/_ext_src/src/*.cu`` (NOT ports of the CUDA
code — these exist so the fast XLA/Pallas implementations in
``istnet_tpu.ops`` can be verified against an independent executable spec).
Used only by tests.
"""

from __future__ import annotations

import numpy as np


def fps_golden(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """sampling_gpu.cu:74-178 — seed 0, argmax of running min-distance."""
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), np.int32)
    for bi in range(b):
        temp = np.full((n,), 1e10, np.float32)
        old = 0
        out[bi, 0] = 0
        for j in range(1, npoint):
            d = np.sum((xyz[bi] - xyz[bi, old]) ** 2, axis=-1).astype(np.float32)
            temp = np.minimum(temp, d)
            old = int(np.argmax(temp))
            out[bi, j] = old
    return out


def ball_query_golden(radius: float, nsample: int, xyz: np.ndarray,
                      new_xyz: np.ndarray) -> np.ndarray:
    """ball_query_gpu.cu:14-59 — first nsample in-radius hits, pad w/ first."""
    b, m, _ = new_xyz.shape
    n = xyz.shape[1]
    out = np.zeros((b, m, nsample), np.int32)
    r2 = radius * radius
    for bi in range(b):
        for j in range(m):
            cnt = 0
            for k in range(n):
                d2 = np.sum((new_xyz[bi, j] - xyz[bi, k]) ** 2)
                if d2 < r2:
                    if cnt == 0:
                        out[bi, j, :] = k
                    out[bi, j, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return out


def three_nn_golden(unknown: np.ndarray, known: np.ndarray):
    """interpolate_gpu.cu:14-73 + sqrt (pointnet2_utils.py:142)."""
    b, n, _ = unknown.shape
    dist = np.zeros((b, n, 3), np.float32)
    idx = np.zeros((b, n, 3), np.int32)
    for bi in range(b):
        d2 = np.sum((unknown[bi][:, None] - known[bi][None]) ** 2, axis=-1)
        for j in range(n):
            best = [1e40, 1e40, 1e40]
            besti = [0, 0, 0]
            for k in range(d2.shape[1]):
                # python float: the CUDA kernel compares in double
                # (interpolate_gpu.cu:31 "double best1 = 1e40"); an np.float32
                # comparison would cast 1e40 -> inf with an overflow warning
                d = float(d2[j, k])
                if d < best[0]:
                    best = [d, best[0], best[1]]
                    besti = [k, besti[0], besti[1]]
                elif d < best[1]:
                    best = [best[0], d, best[1]]
                    besti = [besti[0], k, besti[1]]
                elif d < best[2]:
                    best[2] = d
                    besti[2] = k
            dist[bi, j] = np.sqrt(np.asarray(best, np.float64)).astype(np.float32)
            idx[bi, j] = besti
    return dist, idx
