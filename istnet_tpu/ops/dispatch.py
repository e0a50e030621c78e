"""Backend dispatch: fused Pallas kernels on TPU, pure-XLA elsewhere."""

from __future__ import annotations

import jax
from jax import lax

from istnet_tpu.ops import ball_query_pallas as _bq_pl
from istnet_tpu.ops import fps_pallas as _fps_pl
from istnet_tpu.ops import pointnet2 as _xla
from istnet_tpu.ops import three_nn_pallas as _tnn_pl


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def furthest_point_sample(xyz, npoint: int):
    """FPS with automatic kernel selection (Pallas on TPU, lax.scan elsewhere)."""
    n = xyz.shape[1]
    if _on_tpu() and n % 128 == 0:
        return _fps_pl.furthest_point_sample_pallas(xyz, npoint)
    return _xla.furthest_point_sample(xyz, npoint)


def ball_query(radius: float, nsample: int, xyz, new_xyz):
    """Ball query with automatic kernel selection (fused Pallas on TPU)."""
    n, m = xyz.shape[1], new_xyz.shape[1]
    tm = min(m, max(128, (512 * 1024) // n))
    if _on_tpu() and n % 128 == 0 and m % tm == 0:
        return _bq_pl.ball_query_pallas(radius, nsample, xyz, new_xyz)
    return _xla.ball_query(radius, nsample, xyz, new_xyz)


def three_interpolate(points, idx, weight):
    """3-NN interpolation: interp-matrix MXU contraction on TPU (2-3x over
    the gather), plain gather elsewhere. fp association differs between the
    two by <= 1e-6 relative (documented in three_interpolate_mm)."""
    if _on_tpu():
        return _xla.three_interpolate_mm(points, idx, weight)
    return _xla.three_interpolate(points, idx, weight)


def three_nn(unknown, known):
    """3-NN with automatic kernel selection (fused Pallas on TPU)."""
    n = unknown.shape[1]
    if _on_tpu() and (n < 128 or n % 128 == 0):
        return _tnn_pl.three_nn_pallas(unknown, known)
    return _xla.three_nn(unknown, known)


def fp_interpolate(unknown, known, feats):
    """Whole FP gather stage (3-NN + inverse-distance weights + weighted
    interpolation) as ONE fused Pallas kernel on TPU; the three-op XLA
    composition elsewhere. Gradients flow into ``feats`` only (matching the
    reference's non-diff ThreeNN, ``pointnet2_utils.py:144-146``) on BOTH
    paths: the XLA fallback must stop_gradient the distances because its
    natural autodiff hits d sqrt(0) = inf for points that are their own SA
    centers (FPS centers are a subset of the unknown set, so exact-zero
    distances are guaranteed) — caught by the full-model torch-vs-flax
    gradient parity test as NaN d loss/d pts."""
    n = unknown.shape[1]
    if _on_tpu() and (n < 128 or n % 128 == 0):
        return _tnn_pl.fp_interpolate(unknown, known, feats)
    dist, idx = _xla.three_nn(unknown, known)
    weight = _xla.three_interpolate_weights(lax.stop_gradient(dist))
    return three_interpolate(feats, idx, weight)


def ball_query_group(radii, nsamples, xyz, new_xyz, features=None,
                     use_xyz: bool = True, out_dtype=None):
    """Fused ball query + grouping (one Pallas kernel on TPU: distance
    matmul, hit-rank cumsum, and per-slot one-hot MXU extraction — no index
    tensor, no XLA gathers). ``out_dtype`` (default f32) rounds only the
    final store — pass the compute dtype to skip the consumer's cast."""
    import jax.numpy as jnp
    out_dtype = jnp.float32 if out_dtype is None else out_dtype
    n, m = xyz.shape[1], new_xyz.shape[1]
    if _on_tpu() and n % 128 == 0:
        if features is None:
            c = 3
        else:
            c = features.shape[-1] + (3 if use_xyz else 0)
        tm = _bq_pl.bqg_tile(m, n, c, nsamples)
        if m % tm == 0:
            return list(_bq_pl.ball_query_group(
                tuple(radii), tuple(nsamples), bool(use_xyz), False,
                xyz, new_xyz, features, out_dtype))
    return [g.astype(out_dtype) for g in _xla.ball_query_group(
        radii, nsamples, xyz, new_xyz, features, use_xyz)]


def fold_upsample_kernel_ok(bsz: int, cin: int) -> bool:
    """Whether ``fold_upsample_conv`` will take the Pallas kernel (so callers
    that want the fused BN/PReLU epilogue can decide up front whether their
    epilogue will actually be applied).

    Batch gate history: the round-2 B<=64 verdict (kernel lost 2205 vs 2430
    inf/s at B=128) PREDATES the round-4 BN/PReLU epilogue fusion. Round-5
    re-A/B with the epilogue (device-time profile, B=128): XLA fold + unfused
    PReLU 44.0 us/sample vs kernel 32.3 — full forward 46.28 -> 45.52 ms.
    Gate now B<=128 (the measured range); ISTNET_FOLD_MAX_B overrides for
    future A/Bs."""
    import os
    max_b = int(os.environ.get("ISTNET_FOLD_MAX_B", "128"))
    return _on_tpu() and cin <= 512 and bsz <= max_b


def fold_upsample_conv(x, k, b, epilogue=None):
    """Fused ``conv3x3(resize_x2_align_corners(x))`` (one VMEM pass per image
    on TPU) or ``None`` when unsupported — caller falls back to the XLA fold
    (``nn/layers.py::conv3x3_on_doubled``). Eval-only: the kernel has no VJP.

    ``epilogue``: optional (5, cout) f32 ``[mean, invstd, scale, bias,
    alpha]`` rows fusing the PSPUpsample eval-BN + PReLU tail into the
    output write (ignored on the XLA fallback, where XLA fuses those into
    the conv epilogue by itself).

    Gated BY MEASUREMENT (full eval forward on a v5e):
    - channels: at up1's 1024-channel input the XLA fold's big channel matmul
      already runs at 174 TF/s and the kernel's mandatory per-image
      corner-turn (Mosaic swapaxes, ~11 us/image) loses to it (3.92 vs
      3.55 ms standalone at B=128) -> kernel only when cin <= 512;
    - batch: at B=128 XLA amortizes the fold into its surrounding fusions
      and the kernel LOSES end to end (2205 vs 2430 inf/s), while at B=32
      the kernel wins (2107 vs ~1940 inf/s) -> kernel only when B <= 64."""
    if not fold_upsample_kernel_ok(x.shape[0], x.shape[-1]):
        return None
    from istnet_tpu.ops import fold_upsample_pallas as _fu_pl
    return _fu_pl.fold_upsample_conv_pallas(x, k, b, epilogue=epilogue)


def sa_msg_fused(radii, nsamples, xyz, new_xyz, features, folded):
    """Fully-fused eval SA stage (query+group+folded-MLP+max in one Pallas
    kernel — the grouped tensor and MLP activations never reach HBM), or
    ``None`` when unsupported (non-TPU, tile mismatch, or no features).

    Stage 1 (features=None) stays unfused by THREE measurements: round 2
    (in-kernel K=3 MLP dots pure overhead, 2333 vs 2430 inf/s); round 5
    non-transposed L1 (pad-to-128 slot-dot lanes: 1977 vs 1156 us, forward
    10.90 vs 10.17 ms @B=32); round 5 TRANSPOSED L1
    (sa_msg_fused_t_l1_pallas — c1-sublane dots, absorbs the XLA MLP+max):
    exact parity at B=32 (10.17 ms both) and -0.9% at B=128 (43.63 vs
    43.26) — the XLA MLP it absorbs is already fully overlapped. The
    transposed kernel stays (tested) behind ISTNET_SA1_FUSE=1.

    ``folded``: per radius, per layer (W, b) with eval-BN folded in; see
    ``sa_fused_pallas.sa_msg_fused_pallas``. Returns a list of per-radius
    (B, M, c_last) bf16 post-max features.
    """
    import os
    if features is None and os.environ.get("ISTNET_SA1_FUSE") != "1":
        return None
    if not _on_tpu():
        return None
    from istnet_tpu.ops import sa_fused_pallas as _sa_pl
    n, m = xyz.shape[1], new_xyz.shape[1]
    c = 3 if features is None else features.shape[-1] + 3
    if any(len(layers) != len(folded[0]) for layers in folded):
        return None  # per-radius MLP depths differ -> unfused path
    c_out_max = max(w.shape[-1] for layers in folded for w, _ in layers)
    if features is None:
        # stage-1 trial path (ISTNET_SA1_FUSE=1): the TRANSPOSED L1 kernel
        # (c1-sublane slot dots; the non-transposed form lost to lane
        # padding — see the gate note above)
        from istnet_tpu.ops.ball_query_pallas import bqg_tile
        tm = bqg_tile(m, n, c, nsamples)
        if n % 128 or m % tm:
            return None
        return _sa_pl.sa_msg_fused_t_l1_pallas(tuple(radii), tuple(nsamples),
                                               xyz, new_xyz, tuple(folded))
    tm = _sa_pl.sa_tile(m, n, c, nsamples, c_out_max)
    if n % 128 or m % tm:
        return None
    return _sa_pl.sa_msg_fused_pallas(tuple(radii), tuple(nsamples), xyz,
                                      new_xyz, features, tuple(folded))


def ball_query_multi(radii, nsamples, xyz, new_xyz):
    """Multi-radius ball query over shared centroids (one fused kernel on TPU)."""
    n, m = xyz.shape[1], new_xyz.shape[1]
    tm = min(m, max(128, (512 * 1024) // n))
    if _on_tpu() and n % 128 == 0 and m % tm == 0:
        return _bq_pl.ball_query_multi_pallas(tuple(radii), tuple(nsamples),
                                              xyz, new_xyz)
    return [_xla.ball_query(r, ns, xyz, new_xyz)
            for r, ns in zip(radii, nsamples)]
