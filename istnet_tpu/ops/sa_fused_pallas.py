"""Fully-fused SA-MSG stage for eval: ball query + group + SharedMLP + max.

The unfused eval path materializes, per radius scale, the grouped tensor
(B, M, ns, C) and three SharedMLP activations — ~300 MB of HBM round-trips
per forward at B=128 for stages 2-4, dominating their cost (profiled: the
grouping kernels run at ~20% HBM efficiency on their wide slot-sliced
stores, plus ~0.9 ms of XLA MLP per stage). This kernel keeps each grouped
slot row in VMEM, immediately pushes it through the (BN-folded) MLP, and
max-reduces across slots on-chip — per (image, centroid-tile) program the
only HBM write is the (TM, c_last) post-max feature block.

Semantics composed from the reference ops (grouping exactly as
``ball_query_gpu.cu:14-59`` + ``group_points_gpu.cu:13-38`` via the one-hot
rank formulation shared with ``ball_query_pallas``; MLP/max as
``pytorch_utils.py:25-50`` + ``pointnet2_modules.py:63-73`` in eval mode,
BatchNorm running-stats folded into the Dense weights). EVAL ONLY: training
needs batch-stat reductions over (B, M, ns) mid-MLP, so the train path keeps
the unfused composition (which also provides the custom VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from istnet_tpu.ops.ball_query_pallas import (
    BP_PHASES,
    block_phase,
    bp_indicator,
    lane_cumsum,
    make_tri,
    recombine_exact,
    split_exact,
)

Array = jax.Array


def _pad128(c: int) -> int:
    return -(-c // 128) * 128


def sa_tile(m: int, n: int, c: int, nsamples, c_out_max: int) -> int:
    """Centroid tile for the fused SA kernel.

    Budget differs from ``bqg_tile``: the scratch design keeps no wide
    slot-sliced output block, but holds the (ns*TM, C) grouped scratch and
    the (ns*TM, c_out) MLP activations (lane-padded, bf16). Larger tiles
    than the grouping kernel's fit — e.g. stage 2 (N=512, C=67) runs TM=256
    where bqg_tile picks 128, halving the per-program launch count."""
    import os
    force = os.environ.get("ISTNET_SA_TM")  # A/B override
    if force:
        return min(m, int(force))
    tm = min(m, 512)
    ns = max(nsamples)
    while tm > 64 and (tm * n * 12 + n * n
                       + ns * tm * (_pad128(c) + 2 * _pad128(c_out_max)) * 2
                       ) > 12 * 2 ** 20:
        tm //= 2
    return tm


def _sa_fused_kernel(new_xyz_ref, xyz_t_ref, vals_ref, *rest,
                     radii: tuple, nsamples: tuple, exact_c: int,
                     nlayers: int):
    """One image x TM centroids: grouped slots -> VMEM scratch -> MLP -> max.

    ``rest`` = per radius, per layer: W (c_in, c_out) bf16, b (1, c_out) f32
    (BN-folded), then the per-radius output refs (1, TM, c_last), then one
    (max_ns*TM, C) bf16 scratch.

    Two-phase per radius: slot loop stores each grouped (TM, C) row block
    into the scratch (slot-major), then the MLP runs as ``nlayers`` BIG
    (ns*TM, c_in) @ (c_in, c_out) dots. A per-slot MLP variant (4 small
    chained dots per slot) was A/B'd on hardware and lost to the unfused
    path (5.1 vs 3.8 ms at stage 2) — tiny dependent dots starve the MXU;
    batching through scratch restores large-matmul efficiency while keeping
    the activations in VMEM.
    """
    nr = len(radii)
    w_refs = [[rest[(r * nlayers + l) * 2] for l in range(nlayers)]
              for r in range(nr)]
    b_refs = [[rest[(r * nlayers + l) * 2 + 1] for l in range(nlayers)]
              for r in range(nr)]
    out_refs = rest[nr * nlayers * 2:nr * nlayers * 2 + nr]
    scratch_ref = rest[-1]

    tm = new_xyz_ref.shape[1]
    n = xyz_t_ref.shape[2]
    c = vals_ref.shape[2]
    a = new_xyz_ref[0]            # (TM, 3)
    bt = xyz_t_ref[0]             # (3, N)
    vals = vals_ref[0]            # (N, C) f32

    an = jnp.sum(a * a, axis=1, keepdims=True)
    bn = jnp.sum(bt * bt, axis=0, keepdims=True)
    ab = jnp.dot(a, bt, preferred_element_type=jnp.float32,
                 precision=lax.Precision.HIGHEST)
    d2 = an + bn - 2.0 * ab       # (TM, N), shared by all radii

    lane = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    tri = make_tri(n)
    # exact 3-way bf16 split of the genuine-f32 (xyz) channels — shared
    # helpers with _bq_group_kernel; grouped rows are bit-exact f32 values
    v3 = split_exact(vals, exact_c)
    vals0 = vals[0:1, :]

    chan = lax.broadcasted_iota(jnp.int32, (tm, c), 1)
    cen = (jnp.concatenate([a, jnp.zeros((tm, c - 3), jnp.float32)], axis=1)
           if c > 3 else a)
    cen = jnp.where(chan < 3, cen, 0.0)

    for radius, nsample, out_ref, ws, bs in zip(radii, nsamples, out_refs,
                                                w_refs, b_refs):
        hit = d2 < jnp.float32(radius) ** 2
        cs = lane_cumsum(hit, lane, tri, n)
        cnt = cs[:, n - 1:n]
        no_hit = cnt == 0
        blk, ph = block_phase(cs, hit)
        ph_ind = [bp_indicator(ph, v) for v in range(BP_PHASES)]
        g0 = None
        for s in range(nsample):
            if s % BP_PHASES == 0:
                blk_ind = bp_indicator(blk, s // BP_PHASES)
            oh = blk_ind * ph_ind[s % BP_PHASES]
            g3 = jnp.dot(oh, v3, preferred_element_type=jnp.float32)
            g = recombine_exact(g3, c, exact_c)
            g = jnp.where(no_hit, vals0, g)
            g = g - cen                                  # relative xyz
            if s == 0:
                g0 = g
            else:  # pad slots (cnt < s+1) repeat the first hit = slot 0
                g = jnp.where(cnt >= s + 1, g, g0)
            scratch_ref[s * tm:(s + 1) * tm, :] = g.astype(jnp.bfloat16)
        h = scratch_ref[:nsample * tm, :]                # (ns*TM, C) bf16
        for l in range(nlayers):
            z = jnp.dot(h, ws[l][...], preferred_element_type=jnp.float32)
            if l < nlayers - 1:
                h = jnp.maximum(z + bs[l][...], 0.0).astype(jnp.bfloat16)
        # max over slots (slot-major scratch layout), then the last layer's
        # bias + ReLU, both of which commute past the max
        red = z[:tm]
        for s in range(1, nsample):
            red = jnp.maximum(red, z[s * tm:(s + 1) * tm])
        out = jnp.maximum(red + bs[nlayers - 1][...], 0.0)
        out_ref[0] = out.astype(out_ref.dtype)


def _sa_fused_kernel_l1(new_xyz_ref, xyz_t_ref, vals_ref, *rest,
                        radii: tuple, nsamples: tuple, exact_c: int,
                        nlayers: int):
    """L1-fused variant: the slot-extraction dot emits LAYER-1
    pre-activations directly.

    Reassociation (sa0_bisect insight — MXU dots are overlapped/free, the
    per-slot VPU planes and scratch traffic are the cost): layer 1 is
    linear, so ``relu(bf16(val - cen) @ W1 + b1)`` per extracted row becomes
    ``relu(extract(U) - cen@W1 + b1)`` with ``U = val @ W1`` computed ONCE
    per radius from the exact split values (bf16 products are exact in f32;
    one DEFAULT-precision dot). Each slot then needs ONE one-hot dot into
    c1 lanes — no grouped-row recombine, no (TM, C) scratch write — and the
    batched MLP starts at layer 2. Numerics: U rounds to bf16 before
    extraction and cen@W1 is subtracted after the dot instead of before, a
    bf16-class difference inside the fused path's existing tolerance
    contract (the grouping kernels' bit-parity contracts are untouched).
    """
    nr = len(radii)
    w_refs = [[rest[(r * nlayers + l) * 2] for l in range(nlayers)]
              for r in range(nr)]
    b_refs = [[rest[(r * nlayers + l) * 2 + 1] for l in range(nlayers)]
              for r in range(nr)]
    out_refs = rest[nr * nlayers * 2:nr * nlayers * 2 + nr]
    scratch_ref = rest[-1]

    tm = new_xyz_ref.shape[1]
    n = xyz_t_ref.shape[2]
    c = vals_ref.shape[2]
    a = new_xyz_ref[0]            # (TM, 3)
    bt = xyz_t_ref[0]             # (3, N)
    vals = vals_ref[0]            # (N, C) f32

    an = jnp.sum(a * a, axis=1, keepdims=True)
    bn = jnp.sum(bt * bt, axis=0, keepdims=True)
    ab = jnp.dot(a, bt, preferred_element_type=jnp.float32,
                 precision=lax.Precision.HIGHEST)
    d2 = an + bn - 2.0 * ab       # (TM, N), shared by all radii

    lane = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    tri = make_tri(n)
    v3 = split_exact(vals, exact_c)                  # (N, C + 2*exact_c)

    for radius, nsample, out_ref, ws, bs in zip(radii, nsamples, out_refs,
                                                w_refs, b_refs):
        w1 = ws[0][...]                              # (C, c1) bf16
        c1 = w1.shape[1]
        # U = val @ W1 exactly in f32 accumulation: the split parts dot the
        # same xyz rows of W1 (their sum reconstructs the f32 value)
        w1_ext = (jnp.concatenate([w1, w1[:exact_c], w1[:exact_c]], axis=0)
                  if exact_c else w1)
        u = jnp.dot(v3, w1_ext, preferred_element_type=jnp.float32)
        u_bf = u.astype(jnp.bfloat16)                # (N, c1)
        u0 = u_bf[0:1, :].astype(jnp.float32)        # no-hit -> point 0
        cen_w = jnp.dot(a, w1[:3].astype(jnp.float32),
                        preferred_element_type=jnp.float32)   # (TM, c1)

        hit = d2 < jnp.float32(radius) ** 2
        cs = lane_cumsum(hit, lane, tri, n)
        cnt = cs[:, n - 1:n]
        no_hit = cnt == 0
        blk, ph = block_phase(cs, hit)
        ph_ind = [bp_indicator(ph, v) for v in range(BP_PHASES)]
        z0 = None
        red = None
        for s in range(nsample):
            if s % BP_PHASES == 0:
                blk_ind = bp_indicator(blk, s // BP_PHASES)
            oh = blk_ind * ph_ind[s % BP_PHASES]
            z = jnp.dot(oh, u_bf, preferred_element_type=jnp.float32)
            z = jnp.where(no_hit, u0, z) - cen_w     # (TM, c1)
            if s == 0:
                z0 = z
            else:  # pad slots (cnt < s+1) repeat the first hit = slot 0
                z = jnp.where(cnt >= s + 1, z, z0)
            if nlayers == 1:
                # single-layer MLP: bias + ReLU commute past the slot max
                red = z if red is None else jnp.maximum(red, z)
            else:
                h_s = jnp.maximum(z + bs[0][...], 0.0).astype(jnp.bfloat16)
                scratch_ref[s * tm:(s + 1) * tm, :c1] = h_s
        if nlayers == 1:
            out_ref[0] = jnp.maximum(red + bs[0][...], 0.0
                                     ).astype(out_ref.dtype)
            continue
        h = scratch_ref[:nsample * tm, :c1]          # (ns*TM, c1) bf16
        for l in range(1, nlayers):
            z = jnp.dot(h, ws[l][...], preferred_element_type=jnp.float32)
            if l < nlayers - 1:
                h = jnp.maximum(z + bs[l][...], 0.0).astype(jnp.bfloat16)
        red = z[:tm]
        for s in range(1, nsample):
            red = jnp.maximum(red, z[s * tm:(s + 1) * tm])
        out = jnp.maximum(red + bs[nlayers - 1][...], 0.0)
        out_ref[0] = out.astype(out_ref.dtype)


def _sa_fused_kernel_t_l1(new_xyz_t_ref, xyz_ref, vals_t_ref, *rest,
                          radii: tuple, nsamples: tuple, exact_c: int,
                          nlayers: int):
    """Transposed twin of ``_sa_fused_kernel_l1`` for SMALL-C stages
    (stage 1: C=3): slots extract layer-1 pre-activation COLUMNS via
    (c1, N) @ (N, TM) dots, so the MXU cost stays at the transposed
    grouping kernel's 16-sublane rate instead of paying the non-transposed
    form's pad-to-128 output lanes (the round-5 stage-1 L1 A/B's loss).
    MLP layers 2+ and the slot max run transposed in-kernel; the wrapper
    swaps the (B, c_last, M) outputs back.
    """
    nr = len(radii)
    w_refs = [[rest[(r * nlayers + l) * 2] for l in range(nlayers)]
              for r in range(nr)]
    b_refs = [[rest[(r * nlayers + l) * 2 + 1] for l in range(nlayers)]
              for r in range(nr)]
    out_refs = rest[nr * nlayers * 2:nr * nlayers * 2 + nr]
    scratch_ref = rest[-1]

    from istnet_tpu.ops.ball_query_pallas import (make_tri_lower,
                                                  split_exact_t,
                                                  sublane_cumsum)

    tm = new_xyz_t_ref.shape[2]
    n = xyz_ref.shape[1]
    at = new_xyz_t_ref[0]          # (3, TM)
    b_ = xyz_ref[0]                # (N, 3)
    vals_t = vals_t_ref[0]         # (C, N) f32

    an = jnp.sum(at * at, axis=0, keepdims=True)
    bn = jnp.sum(b_ * b_, axis=1, keepdims=True)
    ab = lax.dot_general(b_, at, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
    d2 = bn + an - 2.0 * ab        # (N, TM)

    sub = lax.broadcasted_iota(jnp.int32, (n, tm), 0)
    tri_l = make_tri_lower(n)
    v3t = split_exact_t(vals_t, exact_c)              # (C + 2ec, N)

    for radius, nsample, out_ref, ws, bs in zip(radii, nsamples, out_refs,
                                                w_refs, b_refs):
        w1t = ws[0][...]                              # (c1, C) bf16 (pre-T)
        c1 = w1t.shape[0]
        w1_cat = (jnp.concatenate(
            [w1t, w1t[:, :exact_c], w1t[:, :exact_c]], axis=1)
            if exact_c else w1t)                      # (c1, C + 2ec)
        u = jnp.dot(w1_cat, v3t, preferred_element_type=jnp.float32)
        u_bf = u.astype(jnp.bfloat16)                 # (c1, N)
        u0 = u_bf[:, 0:1].astype(jnp.float32)         # no-hit -> point 0
        cen_w = jnp.dot(w1t[:, :3].astype(jnp.float32), at,
                        preferred_element_type=jnp.float32)  # (c1, TM)

        hit = d2 < jnp.float32(radius) ** 2
        cs = sublane_cumsum(hit, sub, tri_l, n)
        cnt = cs[n - 1:n, :]
        no_hit = cnt == 0
        blk, ph = block_phase(cs, hit)
        ph_ind = [bp_indicator(ph, v) for v in range(BP_PHASES)]
        z0 = None
        red = None
        for s in range(nsample):
            if s % BP_PHASES == 0:
                blk_ind = bp_indicator(blk, s // BP_PHASES)
            oh = blk_ind * ph_ind[s % BP_PHASES]      # (N, TM)
            z = jnp.dot(u_bf, oh, preferred_element_type=jnp.float32)
            z = jnp.where(no_hit, u0, z) - cen_w      # (c1, TM)
            if s == 0:
                z0 = z
            else:
                z = jnp.where(cnt >= s + 1, z, z0)
            if nlayers == 1:
                red = z if red is None else jnp.maximum(red, z)
            else:
                h_s = jnp.maximum(z + bs[0][...], 0.0).astype(jnp.bfloat16)
                scratch_ref[:c1, s * tm:(s + 1) * tm] = h_s
        if nlayers == 1:
            out_ref[0] = jnp.maximum(red + bs[0][...], 0.0
                                     ).astype(out_ref.dtype)
            continue
        h = scratch_ref[:c1, :nsample * tm]           # (c1, ns*TM) bf16
        for l in range(1, nlayers):
            z = jnp.dot(ws[l][...], h, preferred_element_type=jnp.float32)
            if l < nlayers - 1:
                h = jnp.maximum(z + bs[l][...], 0.0).astype(jnp.bfloat16)
        red = z[:, :tm]
        for s in range(1, nsample):
            red = jnp.maximum(red, z[:, s * tm:(s + 1) * tm])
        out = jnp.maximum(red + bs[nlayers - 1][...], 0.0)
        out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(0, 1, 5))
def sa_msg_fused_t_l1_pallas(radii: tuple, nsamples: tuple, xyz: Array,
                             new_xyz: Array, folded,
                             interpret: bool = False) -> list:
    """Stage-1 (features=None) fused SA via the transposed L1 kernel:
    ``(B, N, 3), (B, M, 3)`` -> per-radius (B, M, c_last) bf16."""
    from istnet_tpu.ops.ball_query_pallas import bqg_tile

    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    xyz = xyz.astype(jnp.float32)
    c, exact_c = 3, 3
    nlayers = len(folded[0])
    if any(len(layers) != nlayers for layers in folded):
        raise ValueError("sa_msg_fused_t_l1 needs one MLP depth per radius")
    tm = bqg_tile(m, n, c, nsamples)
    if m % tm or n % 128:
        raise ValueError(f"sa_msg_fused_t_l1 needs M%{tm}==0 and N%128==0")
    new_xyz_t = jnp.swapaxes(new_xyz.astype(jnp.float32), 1, 2)
    vals_t = jnp.swapaxes(xyz, 1, 2)

    wb_args, wb_specs = [], []
    for layers in folded:
        for w, bias in layers:
            # weights ship pre-transposed: (c_out, c_in) rows on sublanes
            wb_args.extend([jnp.swapaxes(w, 0, 1).astype(jnp.bfloat16),
                            bias.reshape(-1, 1).astype(jnp.float32)])
    for arg in wb_args:
        wb_specs.append(pl.BlockSpec(
            arg.shape, lambda i, j, r=arg.ndim: (0,) * r,
            memory_space=pltpu.VMEM))

    c1_max = max(layers[0][0].shape[-1] for layers in folded)
    out = pl.pallas_call(
        functools.partial(_sa_fused_kernel_t_l1, radii=tuple(radii),
                          nsamples=tuple(nsamples), exact_c=exact_c,
                          nlayers=nlayers),
        out_shape=[jax.ShapeDtypeStruct((b, layers[-1][0].shape[-1], m),
                                        jnp.bfloat16) for layers in folded],
        grid=(b, m // tm),
        in_specs=[
            pl.BlockSpec((1, 3, tm), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + wb_specs,
        out_specs=[pl.BlockSpec((1, layers[-1][0].shape[-1], tm),
                                lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM) for layers in folded],
        scratch_shapes=[pltpu.VMEM((c1_max, max(nsamples) * tm),
                                   jnp.bfloat16)],
        interpret=interpret,
    )(new_xyz_t, xyz, vals_t, *wb_args)
    return [jnp.swapaxes(o, 1, 2) for o in out]


def _l1fuse_enabled() -> bool:
    # default ON (round-5 in-graph A/B: eval forward 10.58 -> 10.17 ms
    # @B=32 and 44.86 -> 43.26 ms @B=128; SA1/2/3 548/183/101 us from
    # 733/307/192); ISTNET_SA_L1FUSE=0 selects the legacy two-phase kernel
    import os
    return os.environ.get("ISTNET_SA_L1FUSE", "1") == "1"


def sa_msg_fused_pallas(radii: tuple, nsamples: tuple, xyz: Array,
                        new_xyz: Array, features: Array,
                        folded, interpret: bool = False) -> list:
    """``(B, N, 3), (B, M, 3), (B, N, Cf)`` + per-radius folded MLP weights
    -> ``[(B, M, c_last_r) bf16 per radius]`` (post-ReLU, max over samples).

    ``folded``: tuple per radius of ((W, b), ...) layer tuples — W (c_in,
    c_out) bf16 with eval BatchNorm scale/rsqrt(var) folded in, b (1, c_out)
    f32 carrying the folded BN shift. Grouping matches QueryAndGroup
    (use_xyz=True) exactly; the MLP math matches the unfused eval path up to
    bf16 rounding of the folded weights.
    """
    return _sa_msg_fused_impl(radii, nsamples, _l1fuse_enabled(), xyz,
                              new_xyz, features, folded, interpret)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 7))
def _sa_msg_fused_impl(radii: tuple, nsamples: tuple, l1: bool, xyz: Array,
                       new_xyz: Array, features: Array,
                       folded, interpret: bool = False) -> list:
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    xyz = xyz.astype(jnp.float32)
    if features is None:
        vals = xyz
        exact_c = 3
    else:
        feats_exact = features.dtype == jnp.bfloat16
        vals = jnp.concatenate([xyz, features.astype(jnp.float32)], axis=-1)
        exact_c = 3 if feats_exact else vals.shape[-1]
    c = vals.shape[-1]
    nlayers = len(folded[0])
    if any(len(layers) != nlayers for layers in folded):
        # the kernel's flat weight-operand indexing assumes one depth
        raise ValueError("sa_msg_fused needs the same MLP depth per radius, "
                         f"got {[len(ls) for ls in folded]}")

    c_out_max = max(w.shape[-1] for layers in folded for w, _ in layers)
    tm = sa_tile(m, n, c, nsamples, c_out_max)
    if m % tm or n % 128:
        raise ValueError(f"sa_msg_fused needs M%{tm}==0 and N%128==0, "
                         f"got M={m} N={n}")
    xyz_t = jnp.swapaxes(xyz, 1, 2)
    grid = (b, m // tm)

    wb_args, wb_specs = [], []
    for layers in folded:
        for w, bias in layers:
            wb_args.extend([w.astype(jnp.bfloat16),
                            bias.reshape(1, -1).astype(jnp.float32)])
    for arg in wb_args:
        wb_specs.append(pl.BlockSpec(
            arg.shape, lambda i, j, r=arg.ndim: (0,) * r,
            memory_space=pltpu.VMEM))

    kern = _sa_fused_kernel_l1 if l1 else _sa_fused_kernel
    scratch_c = (max(layers[0][0].shape[-1] for layers in folded)
                 if l1 else c)
    out = pl.pallas_call(
        functools.partial(kern, radii=tuple(radii),
                          nsamples=tuple(nsamples), exact_c=exact_c,
                          nlayers=nlayers),
        out_shape=[jax.ShapeDtypeStruct((b, m, layers[-1][0].shape[-1]),
                                        jnp.bfloat16) for layers in folded],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tm, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + wb_specs,
        out_specs=[pl.BlockSpec((1, tm, layers[-1][0].shape[-1]),
                                lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM) for layers in folded],
        scratch_shapes=[pltpu.VMEM((max(nsamples) * tm, scratch_c),
                                   jnp.bfloat16)],
        interpret=interpret,
    )(new_xyz.astype(jnp.float32), xyz_t, vals, *wb_args)
    return list(out)
