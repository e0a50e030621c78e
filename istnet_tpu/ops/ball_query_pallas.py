"""Fused Pallas TPU kernel for ball query.

TPU-native replacement for ``ball_query_gpu.cu:14-59`` with identical
semantics (first ``nsample`` in-radius indices in index order, padded with the
first hit, zeros when no hit). Design:

- distances computed on-chip as one (TM, 3) @ (3, N) MXU contraction — the
  (B, M, N) distance matrix never touches HBM;
- the CUDA kernel's sequential hit-counting loop becomes rank arithmetic:
  ``cs = inclusive-cumsum(hit)`` is monotone per row, so the s-th hit sits at
  ``searchsorted(cs, s+1) = sum(cs <= s)`` — one vectorized compare+reduce per
  output slot, no sort/top_k/scatter.

Grid: (B, M/TM) with TM = min(M, 128) centroids per program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _ball_query_kernel(new_xyz_ref, xyz_t_ref, *out_refs,
                       radii: tuple, nsamples: tuple):
    tm = new_xyz_ref.shape[1]
    n = xyz_t_ref.shape[2]
    a = new_xyz_ref[0]            # (TM, 3)
    bt = xyz_t_ref[0]             # (3, N)

    an = jnp.sum(a * a, axis=1, keepdims=True)                    # (TM, 1)
    bn = jnp.sum(bt * bt, axis=0, keepdims=True)                  # (1, N)
    ab = jnp.dot(a, bt, preferred_element_type=jnp.float32,
                 precision=lax.Precision.HIGHEST)                 # (TM, N)
    d2 = an + bn - 2.0 * ab       # shared by all radii

    # inclusive prefix sum along lanes (Mosaic has no cumsum) — see
    # make_tri/lane_cumsum below
    lane = lax.broadcasted_iota(jnp.int32, (tm, n), 1)
    tri = make_tri(n)
    for radius, nsample, out_ref in zip(radii, nsamples, out_refs):
        hit = d2 < jnp.float32(radius) ** 2
        cs = lane_cumsum(hit, lane, tri, n)

        cols = []
        for s in range(nsample):
            # index of the s-th hit; == n when fewer than s+1 hits
            cols.append(jnp.sum((cs <= s).astype(jnp.int32), axis=1, keepdims=True))
        idx = jnp.concatenate(cols, axis=1)                       # (TM, nsample)

        first = idx[:, :1]
        filled = idx < n
        pad = jnp.where(first < n, first, 0)                      # zero row if no hit
        out_ref[0] = jnp.where(filled, idx, pad).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def ball_query_multi_pallas(radii: tuple, nsamples: tuple, xyz: Array,
                            new_xyz: Array, interpret: bool = False) -> list:
    """Multi-radius ball query sharing ONE on-chip distance computation.

    ``(B, N, 3), (B, M, 3) -> [ (B, M, nsamples[i]) int32 per radius ]``.
    The SA-MSG modules query 2 radii per stage over the same centroids
    (modules.py:249-298); fusing them halves the distance work.
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    # large tiles amortize per-program overhead, but the (TM, N) working set
    # (d2 f32 + cs i32 + temps) must stay under the ~16 MB VMEM scoped limit:
    # cap TM*N at 512*1024 (measured ~6 MB); N=2048 then runs at TM=256
    tm = min(m, max(128, (512 * 1024) // n))
    if m % tm or n % 128:
        raise ValueError(f"ball_query_pallas needs M%{tm}==0 and N%128==0, got M={m} N={n}")
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    grid = (b, m // tm)
    out = pl.pallas_call(
        functools.partial(_ball_query_kernel, radii=tuple(radii),
                          nsamples=tuple(nsamples)),
        out_shape=[jax.ShapeDtypeStruct((b, m, ns), jnp.int32) for ns in nsamples],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tm, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tm, ns), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM) for ns in nsamples],
        interpret=interpret,
    )(new_xyz.astype(jnp.float32), xyz_t)
    return list(out)


def ball_query_pallas(radius: float, nsample: int, xyz: Array, new_xyz: Array,
                      interpret: bool = False) -> Array:
    """Single-radius wrapper over the fused multi-radius kernel."""
    return ball_query_multi_pallas((radius,), (nsample,), xyz, new_xyz,
                                   interpret=interpret)[0]


# ---------------------------------------------------------------------------
# Fused ball query + grouping
# ---------------------------------------------------------------------------

def bqg_tile(m: int, n: int, c: int, nsamples) -> int:
    """Centroid tile size for the fused query+group kernel.

    Mosaic's scoped-vmem budget is 16 MB; the kernel holds ~10 live (TM, N)
    f32/i32 planes (d2, cs, hit/oh temporaries — measured 25 MB at TM=512,
    N=1024), the (N, N) int8 triangle, the (N, C) values, and the
    (TM, ns, C) outputs. Budget 12 MB with a measured 40 B/element rate.

    Rejected A/B (hardware-measured, stage-1 shape B=128 N=1024 M=512 C=3):
    a radix-gather slot extraction — decompose the hit index n = n1*L2+n2 and
    replace the K=N one-hot dot (whose 9 output lanes pad to 128) with a
    K=128 dot + n2-masked projection — measured 9.3-12.1 ms vs 8.5 ms for
    this direct form (standalone; TM 128/256/512 sweep). Computing the 48
    per-slot hit indices needs a cross-lane ``sum(cs <= s)`` rank-searchsorted
    per slot, and those reduction trees over (TM, N) cost more VPU time than
    the MXU padding they save. TM=512 is also ~11% slower than 256 for the
    direct form (tools/bqg_radix_ab history, commit-msg numbers)."""
    import os
    force = os.environ.get("ISTNET_BQG_TM")  # A/B override
    if force:
        return int(force)
    # round-5 A/B on the transposed kernel at the SA0 shape (B=32 in-graph
    # device time): TM=256 is bit-for-bit the same 1156.3 us as 512 (the
    # kernel is VPU-work-bound, tools/sa0_bisect.py), TM=128 is worse
    # (1257.5) — per-program overhead shows below 256.
    tm = min(m, 512)
    # x8 on the output term: Mosaic double-buffers output blocks. The (N, N)
    # triangle only exists on the matmul-cumsum path (N <= 1024); the
    # Hillis-Steele path (make_tri -> None) holds no triangle.
    tri_bytes = n * n if n <= 1024 else 0
    while tm > 64 and (tm * (n * 40 + sum(nsamples) * c * 8)
                       + tri_bytes + n * c * 4) > 12 * 2 ** 20:
        tm //= 2
    # the transposed production kernel carries TM on the LANE axis: Mosaic
    # requires lane-axis block dims to be a multiple of 128 or the whole M
    # (regression caught by the N=2048 config: budget shrink picked 64 < M)
    if tm < m:
        tm = max(tm, 128)
    return tm


# --- shared kernel pieces ----------------------------------------------------
# make_tri/lane_cumsum, the bf16 split/recombine, and the blocked one-hot
# (block_phase/bp_indicator) are used by BOTH _bq_group_kernel variants here
# and _sa_fused_kernel (sa_fused_pallas.py) so the formulations cannot
# silently diverge; their exactness is pinned by the bit-parity tests in
# tests/test_pallas_kernels.py and tests/test_sa_fused.py.

def make_tri(n: int):
    """(N, N) int8 upper-triangular ones for the MXU prefix-sum, or None
    when the Hillis-Steele path should be used (large N strains VMEM)."""
    if n > 1024:
        return None
    r_ = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c_ = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r_ <= c_).astype(jnp.int8)


def lane_cumsum(hit, lane, tri, n: int):
    """Inclusive prefix sum of a boolean mask along lanes, int32.

    N <= 1024: int8 MXU matmul against the triangular ones matrix (~10%
    faster than rolls). Larger N: Hillis-Steele doubling with masked rolls.
    """
    if tri is not None:
        return lax.dot_general(hit.astype(jnp.int8), tri,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    cs = hit.astype(jnp.int32)
    shift = 1
    while shift < n:
        rolled = pltpu.roll(cs, shift, axis=1)
        cs = cs + jnp.where(lane >= shift, rolled, 0)
        shift *= 2
    return cs


def split_exact(vals, exact_c: int):
    """Exact 3-way bf16 split (24 mantissa bits) of the first ``exact_c``
    channels; the rest are exactly bf16 already (hi part reconstructs).
    (N, C) f32 -> (N, C + 2*exact_c) bf16 [hi | mid | lo]."""
    v_hi = vals.astype(jnp.bfloat16)
    if not exact_c:
        return v_hi
    head = vals[:, :exact_c]
    r1 = head - head.astype(jnp.bfloat16).astype(jnp.float32)
    v_mid = r1.astype(jnp.bfloat16)
    v_lo = (r1 - v_mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([v_hi, v_mid, v_lo], axis=1)


# --- blocked one-hot: rank block x phase decomposition -----------------------
# The direct per-slot one-hot costs ~4 VPU ops per (plane element, slot)
# (subtract, square, subtract, max). Decomposing the 0-based rank as
# idx = BP_PHASES*block + phase lets each slot's one-hot be ONE bf16 multiply
# of two precomputed indicator planes, amortizing indicator construction over
# BP_PHASES slots (~2x less per-slot VPU work at nsample=16/32). Pad slots
# are no longer encoded in the one-hot (the direct form retargeted them at
# rank 1); callers substitute slot 0's OUTPUT row for slots s with
# cnt < s+1 — bit-identical, since slot 0 is exactly the first hit.

BP_PHASES = 4  # 4 phase planes: same ~2x VPU win as 8 with half the VMEM


def block_phase(cs, hit):
    """bf16 (block, phase) planes of the 0-based hit ranks: for hit lanes
    idx = rank-1 = BP_PHASES*block + phase; non-hit lanes get idx 511 whose
    block (127) matches no slot indicator. Values <= 511/BP_PHASES are exact
    ints in bf16."""
    t = jnp.where(hit, cs - 1, 511)
    return ((t // BP_PHASES).astype(jnp.bfloat16),
            (t % BP_PHASES).astype(jnp.bfloat16))


def bp_indicator(x, v: int):
    """relu(1 - (x-v)^2): exact {0,1} equality on exact-int bf16 planes (any
    |d| >= 1 keeps d*d >= 1 after bf16 rounding; same argument as
    the retired direct slot_onehot form, which Mosaic required over packed-bf16
    compares)."""
    d = x - jnp.bfloat16(v)
    return jnp.maximum(jnp.bfloat16(1) - d * d, jnp.bfloat16(0))


def recombine_exact(g3, c: int, exact_c: int):
    """Sum the hi/mid/lo parts of a one-hot x split-values dot back to the
    exact f32 grouped row: (TM, C + 2*exact_c) -> (TM, C)."""
    g = g3[:, :c]
    if not exact_c:
        return g
    fix = g3[:, c:c + exact_c] + g3[:, c + exact_c:c + 2 * exact_c]
    if exact_c == c:
        return g + fix
    return jnp.concatenate([g[:, :exact_c] + fix, g[:, exact_c:]], axis=1)


def _bq_group_kernel(new_xyz_ref, xyz_t_ref, vals_ref, *out_refs,
                     radii: tuple, nsamples: tuple, sub_xyz: int,
                     exact_c: int):
    """Grouped values directly, no index materialization, no gathers.

    For each output slot s the one-hot of the s-th in-radius hit is
    ``hit & (cs == s+1)`` (cs = inclusive cumsum of hit — the hit lane where
    the count reaches s+1 is unique), so the grouped row is ONE (TM, N) @
    (N, C + 2*exact_c) MXU contraction. Pad slots (s+1 > count) take slot
    0's output row (= the first hit) and zero-hit rows are post-filled with
    point 0 — bit-identical to gathering with the CUDA index semantics
    (``ball_query_gpu.cu:38-46``).

    Per-slot cost engineering (the VPU/VMEM traffic dominates):
    - the one-hot is the blocked form (``block_phase``/``bp_indicator``):
      rank block/phase indicator planes are built once per radius and each
      slot's one-hot is ONE bf16 multiply (in-graph A/B on hardware:
      eval forward 2514 -> 2590 inf/s @B=128, +4.5% @B=32);
    - the value matrix is split hi/mid/lo into bf16 planes: a bf16 MXU pass
      is EXACT for a one-hot LHS (products are 1.0 x part, f32 accumulation;
      the parts sum back to the exact f32), so one DEFAULT-precision dot
      replaces a 6-pass HIGHEST f32 dot and reads the one-hot once;
    - only the first ``exact_c`` channels carry mid/lo planes. Channels that
      are exactly bf16-representable (grouped features in a bf16 model: the
      f32 upcast round-trips) have zero mid/lo parts, so the wrapper passes
      exact_c=3 (just the f32 xyz) and the dot width shrinks from 3C to C+6
      — ~2.7x fewer (padded) MXU columns at stage-2..4 shapes.

    ``sub_xyz`` > 0 subtracts the query centroid from the first 3 channels
    (the relative-xyz of QueryAndGroup, ``pointnet2_utils.py:343-347``).
    """
    out_dtype = out_refs[0].dtype
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
    v3 = split_exact(vals, exact_c)                           # (N, C+2*exact_c)
    vals0 = vals[0:1, :]                                      # (1, C)

    if sub_xyz:
        chan = lax.broadcasted_iota(jnp.int32, (tm, c), 1)
        cen = jnp.concatenate(
            [a, jnp.zeros((tm, c - 3), jnp.float32)], axis=1) if c > 3 else a
        cen = jnp.where(chan < 3, cen, 0.0)

    for radius, nsample, out_ref in zip(radii, nsamples, out_refs):
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
            oh = blk_ind * ph_ind[s % BP_PHASES]              # (TM, N)
            g3 = jnp.dot(oh, v3, preferred_element_type=jnp.float32)
            g = recombine_exact(g3, c, exact_c)
            g = jnp.where(no_hit, vals0, g)                   # no hit -> point 0
            if sub_xyz:
                g = g - cen
            if s == 0:
                g0 = g
            else:  # pad slots (cnt < s+1) repeat the first hit = slot 0
                g = jnp.where(cnt >= s + 1, g, g0)
            # slot-flattened lane layout: a (TM, ns, C) block would pad C up
            # to the 128-lane tile (43x waste at C=3, VMEM-OOM at prod shapes)
            out_ref[0, :, s * c:(s + 1) * c] = g.astype(out_dtype)


@functools.partial(jax.jit, static_argnums=(0, 1, 5, 6, 7))
def ball_query_group_pallas(radii: tuple, nsamples: tuple, xyz: Array,
                            new_xyz: Array, features: Array | None = None,
                            use_xyz: bool = True,
                            interpret: bool = False,
                            out_dtype=jnp.float32) -> list:
    """Fused multi-radius ball query + grouping.

    ``(B, N, 3), (B, M, 3)[, (B, N, C)] -> [(B, M, ns_i, Cout) per radius]``
    with Cout = 3 + C (relative xyz ++ grouped features), matching
    QueryAndGroup(use_xyz=True) — the gather-free replacement for
    ``ball_query -> group_points`` (one pass on-chip; the (B, M, N) distance
    matrix, the hit ranks, and the neighbor indices never reach HBM).

    ``out_dtype``: output dtype; grouping math stays f32, only the final
    store rounds (identical to a post-hoc ``convert_element_type``). Passing
    the compute dtype saves the cast pass AND halves the kernel's HBM write
    traffic (profiled 4.3 ms of pure casts at B=128 with f32 outputs).
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    xyz = xyz.astype(jnp.float32)
    # channels needing the full 3-way split: bf16 features round-trip the f32
    # upcast exactly (zero mid/lo parts), so only genuine-f32 channels get
    # mid/lo planes — shrinks the per-slot MXU dot width from 3C to C+6
    feats_exact = features is not None and features.dtype == jnp.bfloat16
    if features is None:
        vals = xyz
        exact_c = 3
    elif use_xyz:
        vals = jnp.concatenate([xyz, features.astype(jnp.float32)], axis=-1)
        exact_c = 3 if feats_exact else vals.shape[-1]
    else:
        vals = features.astype(jnp.float32)
        exact_c = 0 if feats_exact else vals.shape[-1]
    c = vals.shape[-1]
    sub_xyz = 1 if (features is None or use_xyz) else 0

    tm = bqg_tile(m, n, c, nsamples)
    if m % tm or n % 128:
        raise ValueError(f"ball_query_group_pallas needs M%{tm}==0 and "
                         f"N%128==0, got M={m} N={n}")
    xyz_t = jnp.swapaxes(xyz, 1, 2)
    grid = (b, m // tm)
    out = pl.pallas_call(
        functools.partial(_bq_group_kernel, radii=tuple(radii),
                          nsamples=tuple(nsamples), sub_xyz=sub_xyz,
                          exact_c=exact_c),
        out_shape=[jax.ShapeDtypeStruct((b, m, ns * c), out_dtype)
                   for ns in nsamples],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tm, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tm, ns * c), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM) for ns in nsamples],
        interpret=interpret,
    )(new_xyz.astype(jnp.float32), xyz_t, vals)
    return [o.reshape(b, m, ns, c) for o, ns in zip(out, nsamples)]


# --- transposed-layout variant ----------------------------------------------
# Same math as _bq_group_kernel with every (TM, N) plane transposed to
# (N, TM): the per-slot one-hot dot becomes (C+2ec, N) @ (N, TM), so the tiny
# grouped-channel width (9 at stage-1's C=3) pads to the 8/16-row SUBLANE
# tile instead of the 128-lane tile — ~8x less padded MXU work per slot.
# Profitable exactly when C is small (the one-hot dot dominates); dispatch
# picks it for C + 2*exact_c <= 16.

def make_tri_lower(n: int):
    """(N, N) int8 lower-triangular ones: cs_t = tri_l @ hit_t is the
    inclusive prefix sum along SUBLANES. None for large N (VMEM)."""
    if n > 1024:
        return None
    r_ = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c_ = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r_ >= c_).astype(jnp.int8)


def sublane_cumsum(hit, sub, tri_l, n: int):
    """Inclusive prefix sum of (N, TM) boolean mask along sublanes, int32."""
    if tri_l is not None:
        return lax.dot_general(tri_l, hit.astype(jnp.int8),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    cs = hit.astype(jnp.int32)
    shift = 1
    while shift < n:
        rolled = pltpu.roll(cs, shift, axis=0)
        cs = cs + jnp.where(sub >= shift, rolled, 0)
        shift *= 2
    return cs


def split_exact_t(vals_t, exact_c: int):
    """``split_exact`` for (C, N) row-major values -> (C + 2*exact_c, N)."""
    v_hi = vals_t.astype(jnp.bfloat16)
    if not exact_c:
        return v_hi
    head = vals_t[:exact_c, :]
    r1 = head - head.astype(jnp.bfloat16).astype(jnp.float32)
    v_mid = r1.astype(jnp.bfloat16)
    v_lo = (r1 - v_mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([v_hi, v_mid, v_lo], axis=0)


def recombine_exact_t(g3, c: int, exact_c: int):
    """``recombine_exact`` on rows: (C + 2*exact_c, TM) -> (C, TM)."""
    g = g3[:c, :]
    if not exact_c:
        return g
    fix = g3[c:c + exact_c, :] + g3[c + exact_c:c + 2 * exact_c, :]
    if exact_c == c:
        return g + fix
    return jnp.concatenate([g[:exact_c, :] + fix, g[exact_c:, :]], axis=0)


def _bq_group_kernel_t(new_xyz_t_ref, xyz_ref, vals_t_ref, *out_refs,
                       radii: tuple, nsamples: tuple, sub_xyz: int,
                       exact_c: int):
    """Transposed twin of ``_bq_group_kernel`` — bit-identical outputs
    (one-hot x bf16-split dots are exact on either side; pinned by
    tests/test_pallas_kernels.py)."""
    out_dtype = out_refs[0].dtype
    tm = new_xyz_t_ref.shape[2]
    n = xyz_ref.shape[1]
    c = vals_t_ref.shape[1]
    at = new_xyz_t_ref[0]          # (3, TM)
    b_ = xyz_ref[0]                # (N, 3)
    vals_t = vals_t_ref[0]         # (C, N)

    an = jnp.sum(at * at, axis=0, keepdims=True)                  # (1, TM)
    bn = jnp.sum(b_ * b_, axis=1, keepdims=True)                  # (N, 1)
    ab = lax.dot_general(b_, at, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)         # (N, TM)
    d2 = bn + an - 2.0 * ab

    sub = lax.broadcasted_iota(jnp.int32, (n, tm), 0)
    tri_l = make_tri_lower(n)
    v3t = split_exact_t(vals_t, exact_c)                          # (C+2ec, N)
    vals0 = vals_t[:, 0:1]                                        # (C, 1)

    if sub_xyz:
        row = lax.broadcasted_iota(jnp.int32, (c, tm), 0)
        cen = jnp.concatenate(
            [at, jnp.zeros((c - 3, tm), jnp.float32)], axis=0) if c > 3 else at
        cen = jnp.where(row < 3, cen, 0.0)

    for radius, nsample, out_ref in zip(radii, nsamples, out_refs):
        hit = d2 < jnp.float32(radius) ** 2
        cs = sublane_cumsum(hit, sub, tri_l, n)
        cnt = cs[n - 1:n, :]
        no_hit = cnt == 0
        blk, ph = block_phase(cs, hit)
        ph_ind = [bp_indicator(ph, v) for v in range(BP_PHASES)]
        g0 = None
        for s in range(nsample):
            if s % BP_PHASES == 0:
                blk_ind = bp_indicator(blk, s // BP_PHASES)
            oh = blk_ind * ph_ind[s % BP_PHASES]                  # (N, TM)
            g3 = jnp.dot(v3t, oh, preferred_element_type=jnp.float32)
            g = recombine_exact_t(g3, c, exact_c)                 # (C, TM)
            g = jnp.where(no_hit, vals0, g)
            if sub_xyz:
                g = g - cen
            if s == 0:
                g0 = g
            else:  # pad slots (cnt < s+1) repeat the first hit = slot 0
                g = jnp.where(cnt >= s + 1, g, g0)
            out_ref[0, s * c:(s + 1) * c, :] = g.astype(out_dtype)


@functools.partial(jax.jit, static_argnums=(0, 1, 5, 6, 7))
def ball_query_group_pallas_t(radii: tuple, nsamples: tuple, xyz: Array,
                              new_xyz: Array, features: Array | None = None,
                              use_xyz: bool = True,
                              interpret: bool = False,
                              out_dtype=jnp.float32) -> list:
    """Transposed-layout fused query+group — same contract as
    ``ball_query_group_pallas``; kernel emits slot-major (B, ns*C, M) blocks
    and the cheap (B, ns*C, M) -> (B, M, ns*C) transpose runs in XLA."""
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    xyz = xyz.astype(jnp.float32)
    feats_exact = features is not None and features.dtype == jnp.bfloat16
    if features is None:
        vals = xyz
        exact_c = 3
    elif use_xyz:
        vals = jnp.concatenate([xyz, features.astype(jnp.float32)], axis=-1)
        exact_c = 3 if feats_exact else vals.shape[-1]
    else:
        vals = features.astype(jnp.float32)
        exact_c = 0 if feats_exact else vals.shape[-1]
    c = vals.shape[-1]
    sub_xyz = 1 if (features is None or use_xyz) else 0

    tm = bqg_tile(m, n, c, nsamples)
    if m % tm or n % 128:
        raise ValueError(f"ball_query_group_pallas_t needs M%{tm}==0 and "
                         f"N%128==0, got M={m} N={n}")
    new_xyz_t = jnp.swapaxes(new_xyz.astype(jnp.float32), 1, 2)   # (B, 3, M)
    vals_t = jnp.swapaxes(vals, 1, 2)                             # (B, C, N)
    grid = (b, m // tm)
    out = pl.pallas_call(
        functools.partial(_bq_group_kernel_t, radii=tuple(radii),
                          nsamples=tuple(nsamples), sub_xyz=sub_xyz,
                          exact_c=exact_c),
        out_shape=[jax.ShapeDtypeStruct((b, ns * c, m), out_dtype)
                   for ns in nsamples],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tm), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 3), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, ns * c, tm), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM) for ns in nsamples],
        interpret=interpret,
    )(new_xyz_t, xyz, vals_t)
    return [jnp.swapaxes(o, 1, 2).reshape(b, m, ns, c)
            for o, ns in zip(out, nsamples)]


# --- differentiable wrapper --------------------------------------------------
# The reference's group_points/QueryAndGroup is differentiable in the grouped
# values (scatter-add backward via atomicAdd, group_points_gpu.cu:45-80); the
# Pallas forward needs a custom VJP. Backward: recompute the neighbor indices
# with the (cheap, non-diff) index kernel, then scatter-add the cotangents by
# a transposed one-hot MXU contraction — deterministic, pad slots route their
# grads to the first hit and zero-hit rows to point 0, exactly like autodiff
# through the gather path.

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 7))
def ball_query_group(radii: tuple, nsamples: tuple, use_xyz: bool,
                     interpret: bool,
                     xyz: Array, new_xyz: Array, features: Array | None,
                     out_dtype=jnp.float32):
    # transposed layout is the production kernel: bit-identical outputs and
    # faster at every SA stage shape (hardware A/B, B=24 per-stage: 4.17 ->
    # 3.75, 3.42 -> 3.03, 3.25 -> 2.86, 3.93 -> 2.92 ms; B=128 stage-1:
    # 10.0 -> 8.33 ms) — the slot dot's pad-to-128-lanes was the cost
    return tuple(ball_query_group_pallas_t(radii, nsamples, xyz, new_xyz,
                                           features, use_xyz,
                                           interpret=interpret,
                                           out_dtype=out_dtype))


def _bqg_fwd(radii, nsamples, use_xyz, interpret, xyz, new_xyz, features,
             out_dtype=jnp.float32):
    outs = ball_query_group(radii, nsamples, use_xyz, interpret,
                            xyz, new_xyz, features, out_dtype)
    return outs, (xyz, new_xyz, features)


def _bqg_bwd(radii, nsamples, use_xyz, interpret, out_dtype, res, g_bars):
    xyz, new_xyz, features = res
    n = xyz.shape[1]
    sub_xyz = features is None or use_xyz
    idx_list = ball_query_multi_pallas(tuple(radii), tuple(nsamples), xyz,
                                       new_xyz, interpret=interpret)
    xyz_bar = jnp.zeros_like(xyz)
    new_bar = jnp.zeros_like(new_xyz)
    feat_bar = None if features is None else jnp.zeros_like(features)
    for idx, g in zip(idx_list, g_bars):
        b, m, ns = idx.shape
        if g.dtype == jnp.bfloat16:
            # production path (out_dtype=bf16 cotangents): a bf16 MXU pass is
            # exact for a one-hot LHS (products are 1.0 x g, f32 accumulation)
            # and the (B, K, N) indicator is the dominant HBM traffic of this
            # backward — bf16 halves it vs the f32 form below
            oh = jax.nn.one_hot(idx.reshape(b, m * ns), n, dtype=jnp.bfloat16)
            scat = jnp.einsum("bkn,bkc->bnc", oh, g.reshape(b, m * ns, -1),
                              preferred_element_type=jnp.float32)
        else:
            gf = g.reshape(b, m * ns, -1).astype(jnp.float32)
            oh = jax.nn.one_hot(idx.reshape(b, m * ns), n, dtype=jnp.float32)
            scat = jnp.einsum("bkn,bkc->bnc", oh, gf,
                              precision=lax.Precision.HIGHEST)
        if features is None:
            xyz_bar = xyz_bar + scat
        elif use_xyz:
            xyz_bar = xyz_bar + scat[..., :3]
            feat_bar = feat_bar + scat[..., 3:].astype(features.dtype)
        else:
            feat_bar = feat_bar + scat.astype(features.dtype)
        if sub_xyz:  # rel-xyz: d(x_n - c_m)/dc_m = -1 summed over slots
            # accumulate in f32: jnp.sum of a bf16 array reduces IN bf16,
            # which rounds every partial sum — up to ~1 bf16 ulp of drift vs
            # the XLA path's f32 reduction (caught by
            # test_ball_query_group_vjp_bf16_cotangents). bf16 cotangents are
            # exact in f32, so this matches XLA up to summation order.
            new_bar = new_bar - jnp.sum(g[..., :3].astype(jnp.float32),
                                        axis=2).astype(new_xyz.dtype)
    return xyz_bar.astype(xyz.dtype), new_bar, feat_bar


ball_query_group.defvjp(_bqg_fwd, _bqg_bwd)
