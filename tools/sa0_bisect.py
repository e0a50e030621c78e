"""Bisect the SA0 (stage-1 ball-query-group) kernel's device cost.

SA0 is the #2 eval consumer (4.62 ms at B=128, 36.1 us/sample, batch-flat).
Before attempting another slot-extraction redesign (VERDICT r4 item 8 —
five formulations are already A/B-rejected), measure WHERE the time goes by
running variant kernels that drop one stage each:

  full     the production transposed kernel (ball_query_group_pallas_t)
  fixed    nsamples (1,1): d2 + 2x cumsum + indicator builds + 2 slots
  nodot    all 48 slot one-hots built and summed (VPU), no MXU value dots
  nomult   48 value dots against raw phase planes (MXU), no blk*ph multiply

Cost model: full - nodot ~= dot cost; full - nomult ~= one-hot multiply
cost; fixed ~= shared overhead. Timing: fori_loop chains with a forced
scalar D2H (axon block_until_ready is a no-op).

Usage: python tools/sa0_bisect.py [--batch 128]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RADII, NS = (0.05, 0.1), (16, 32)   # SA0 contract shape (scaled cloud)
CHAIN = 30
ITERS = 3


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--m", type=int, default=512)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from istnet_tpu.ops import ball_query_pallas as B

    b, n, m = args.batch, args.n, args.m
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.1)
    cent = jnp.asarray(rng.randn(b, m, 3).astype(np.float32) * 0.1)

    def variant_kernel(mode, nsamples):
        def kern(new_xyz_t_ref, xyz_ref, vals_t_ref, *out_refs):
            tm = new_xyz_t_ref.shape[2]
            n_ = xyz_ref.shape[1]
            c = vals_t_ref.shape[1]
            at = new_xyz_t_ref[0]
            b_ = xyz_ref[0]
            vals_t = vals_t_ref[0]
            an = jnp.sum(at * at, axis=0, keepdims=True)
            bn = jnp.sum(b_ * b_, axis=1, keepdims=True)
            ab = lax.dot_general(b_, at, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=lax.Precision.HIGHEST)
            d2 = bn + an - 2.0 * ab
            sub = lax.broadcasted_iota(jnp.int32, (n_, tm), 0)
            tri_l = B.make_tri_lower(n_)
            v3t = B.split_exact_t(vals_t, 3)
            for radius, nsample, out_ref in zip(RADII, nsamples, out_refs):
                hit = d2 < jnp.float32(radius) ** 2
                cs = B.sublane_cumsum(hit, sub, tri_l, n_)
                blk, ph = B.block_phase(cs, hit)
                ph_ind = [B.bp_indicator(ph, v) for v in range(B.BP_PHASES)]
                acc = None
                for s in range(nsample):
                    if s % B.BP_PHASES == 0:
                        blk_ind = B.bp_indicator(blk, s // B.BP_PHASES)
                    if mode == "nodot":
                        oh = blk_ind * ph_ind[s % B.BP_PHASES]
                        acc = oh if acc is None else acc + oh
                    elif mode == "nomult":
                        g3 = jnp.dot(v3t, ph_ind[s % B.BP_PHASES],
                                     preferred_element_type=jnp.float32)
                        g = g3[:c]
                        out_ref[0, s * c:(s + 1) * c, :] = g
                    else:  # full-like (no wheres — pure extract)
                        oh = blk_ind * ph_ind[s % B.BP_PHASES]
                        g3 = jnp.dot(v3t, oh,
                                     preferred_element_type=jnp.float32)
                        out_ref[0, s * c:(s + 1) * c, :] = g3[:c]
                if mode == "nodot":
                    out_ref[0, 0:c, :] = jnp.broadcast_to(
                        jnp.sum(acc, axis=0, keepdims=True), (c, tm)
                        ).astype(out_ref.dtype)
        return kern

    def run_variant(mode, nsamples=NS):
        c = 3
        tm = B.bqg_tile(m, n, c, nsamples)
        new_xyz_t = jnp.swapaxes(cent, 1, 2)
        vals_t = jnp.swapaxes(xyz, 1, 2)
        kern = variant_kernel(mode, nsamples)

        @jax.jit
        def call(new_xyz_t, xyz_, vals_t):
            return pl.pallas_call(
                kern,
                out_shape=[jax.ShapeDtypeStruct((b, ns * c, m), jnp.float32)
                           for ns in nsamples],
                grid=(b, m // tm),
                in_specs=[
                    pl.BlockSpec((1, 3, tm), lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n, 3), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, c, n), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[pl.BlockSpec((1, ns * c, tm), lambda i, j: (i, 0, j),
                                        memory_space=pltpu.VMEM)
                           for ns in nsamples],
            )(new_xyz_t, xyz_, vals_t)

        @jax.jit
        def chain(new_xyz_t, xyz_, vals_t):
            def body(i, acc):
                out = call(new_xyz_t + acc * 1e-12, xyz_, vals_t)
                return acc + out[0][0, 0, 0] * 1e-12
            return lax.fori_loop(0, CHAIN, body, jnp.float32(0))

        _ = float(chain(new_xyz_t, xyz, vals_t))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            _ = float(chain(new_xyz_t, xyz, vals_t))
        return (time.perf_counter() - t0) / (ITERS * CHAIN) * 1000

    def run_prod():
        @jax.jit
        def chain(xyz_, cent_):
            def body(i, acc):
                out = B.ball_query_group_pallas_t(RADII, NS, xyz_ + acc * 1e-12,
                                                  cent_)
                return acc + out[0][0, 0, 0, 0] * 1e-12
            return lax.fori_loop(0, CHAIN, body, jnp.float32(0))
        _ = float(chain(xyz, cent))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            _ = float(chain(xyz, cent))
        return (time.perf_counter() - t0) / (ITERS * CHAIN) * 1000

    res = {"batch": b, "n": n, "m": m}
    res["prod_ms"] = round(run_prod(), 3)
    for mode in ("extract", "nodot", "nomult"):
        res[f"{mode}_ms"] = round(run_variant(mode), 3)
    res["fixed_ms"] = round(run_variant("extract", nsamples=(1, 1)), 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
