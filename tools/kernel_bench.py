"""Per-op microbenchmarks on the real TPU: where does the eval forward go?

PREFER tools/profile_fwd.py: it attributes REAL in-graph device time per op
(trace.json.gz device plane). Standalone chained-loop numbers here can be
several times larger than the same op's in-graph cost (e.g. FPS measured
6.4 ms standalone vs ~1 ms inside the forward, where XLA overlaps the
serial kernel with unrelated work) — use this tool only for A/B'ing one op
formulation against another under identical conditions.

Times each hot op of the PointNet++ pipeline (FPS, fused multi-radius ball
query, grouping gathers, three-NN, and the full ISTNet eval forward) at the
shapes the flagship model actually runs (B=128 peak-throughput batch).

Methodology (CLAUDE.md): the axon tunnel's block_until_ready does not block
and per-call D2H sync costs ~30 ms, so each op runs CHAIN times inside one
jitted fori_loop with input perturbation (defeats CSE/hoisting), and one
scalar is pulled at the end. Reported time = amortized per-call.

Usage: python tools/kernel_bench.py [--batch 128] [--ops fps,bq,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 20
ITERS = 3
WARMUP = 1

# (N, M) per SA stage at sample_num=1024; nsamples fixed (16, 32)
SA_STAGES = [(1024, 512), (512, 256), (256, 128), (128, 64)]
RADII_CAM = [(0.01, 0.02), (0.02, 0.04), (0.04, 0.08), (0.08, 0.16)]


def timed_chain(fn, x, extract, perturb) -> float:
    """Amortized seconds/call of fn inside one jitted fori_loop."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chain(x):
        def body(i, acc):
            out = fn(perturb(x, acc))
            return acc + extract(out)
        return lax.fori_loop(0, CHAIN, body, jnp.float32(0))

    _ = float(chain(x))
    for _ in range(WARMUP):
        _ = float(chain(x))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = float(chain(x))
    return (time.perf_counter() - t0) / (ITERS * CHAIN)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--ops", default="fps,bq,group,tnn,fwd")
    args = p.parse_args()
    which = set(args.ops.split(","))

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from istnet_tpu import ops

    b = args.batch
    rng = np.random.RandomState(0)
    results = {}

    def pts(n):
        return jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.1)

    perturb_pts = lambda x, acc: x + acc * 1e-12
    if "fps" in which:
        for n, m in SA_STAGES:
            x = pts(n)
            dt = timed_chain(lambda v, m=m: ops.furthest_point_sample(v, m), x,
                             lambda o: jnp.sum(o[0].astype(jnp.float32)) * 1e-9,
                             perturb_pts)
            results[f"fps_n{n}_m{m}"] = round(dt * 1e3, 3)

    if "bq" in which:
        for (n, m), radii in zip(SA_STAGES, RADII_CAM):
            x = pts(n)
            q = jnp.asarray(rng.randn(b, m, 3).astype(np.float32) * 0.1)

            def run(v, q=q, radii=radii):
                o = ops.ball_query_multi(radii, (16, 32), v, q)
                return o

            dt = timed_chain(run, x,
                             lambda o: (jnp.sum(o[0][0].astype(jnp.float32))
                                        + jnp.sum(o[1][0].astype(jnp.float32))) * 1e-9,
                             perturb_pts)
            results[f"bq_n{n}_m{m}"] = round(dt * 1e3, 3)

    if "group" in which:
        # grouping gathers at stage-2 shapes (the largest with features)
        for n, m, c in [(1024, 512, 3), (512, 256, 96), (256, 128, 192)]:
            feats = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
            idx = jnp.asarray(rng.randint(0, n, size=(b, m, 32)).astype(np.int32))
            dt = timed_chain(lambda v: ops.group_points(v, idx), feats,
                             lambda o: jnp.sum(o[:, 0, 0, 0]) * 1e-9,
                             lambda x, acc: x + acc * 1e-12)
            results[f"group_n{n}_m{m}_c{c}"] = round(dt * 1e3, 3)

    if "tnn" in which:
        for n, m in [(1024, 512), (512, 256), (256, 128), (128, 64)]:
            unk = pts(n)
            kn = jnp.asarray(rng.randn(b, m, 3).astype(np.float32) * 0.1)
            dt = timed_chain(lambda v: ops.three_nn(v, kn), unk,
                             lambda o: jnp.sum(o[0][:, 0, :]) * 1e-9,
                             perturb_pts)
            results[f"tnn_n{n}_m{m}"] = round(dt * 1e3, 3)

    if "fwd" in which:
        from istnet_tpu.nn import precision
        precision.set_compute_dtype(jnp.bfloat16)
        import __graft_entry__ as g
        fn, (params, stats, _) = g.entry()
        inputs = g._make_inputs(b=b, n=1024, img=192, train=False)

        def run(inp):
            return fn(params, stats, inp)

        def perturb(inp, acc):
            out = dict(inp)
            out["pts"] = out["pts"] + acc * 1e-12
            out["rgb"] = out["rgb"] + acc * 1e-12
            return out

        dt = timed_chain(run, inputs,
                         lambda o: jnp.sum(o["pred_translation"][0]) * 1e-9,
                         perturb)
        results[f"fwd_b{b}"] = round(dt * 1e3, 3)
        results["fwd_inf_per_sec"] = round(b / dt, 1)

    results["batch"] = b
    print(json.dumps(results))


if __name__ == "__main__":
    main()
