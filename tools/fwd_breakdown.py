"""Stage-level breakdown of the ISTNet eval forward on the real TPU.

Times the three macro-stages of the eval graph separately (amortized chained
loops per CLAUDE.md methodology): the RGB encoder (sparse eval head), the
camera-space PointNet2MSG extractor, and the implicit-transform + heavy
estimator tail. Sum should roughly match the full forward (fwd_b128 from
tools/kernel_bench.py); the gaps show fusion wins/losses.

Usage: python tools/fwd_breakdown.py [--batch 128]
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


def timed_chain(fn, x, extract, perturb) -> float:
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
    _ = float(chain(x))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        _ = float(chain(x))
    return (time.perf_counter() - t0) / (ITERS * CHAIN)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()
    b = args.batch

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from istnet_tpu.nn import precision
    precision.set_compute_dtype(jnp.bfloat16)

    from istnet_tpu.models.ist_net import CAM_RADII, ISTNet
    from istnet_tpu.nn.estimators import HeavyEstimator, ImplicitTransformation
    from istnet_tpu.nn.pointnet2_msg import PointNet2MSG
    from istnet_tpu.nn.resnet_psp import ModifiedResnet

    rng = np.random.RandomState(0)
    results = {}

    model = ISTNet()
    inputs = {
        "rgb": jnp.asarray(rng.randn(b, 192, 192, 3).astype(np.float32)),
        "pts": jnp.asarray(rng.randn(b, 1024, 3).astype(np.float32) * 0.1),
        "choose": jnp.asarray(rng.randint(0, 192 * 192, size=(b, 1024)).astype(np.int32)),
        "category_label": jnp.asarray(rng.randint(0, 6, size=(b,)).astype(np.int32)),
    }
    init = jax.jit(model.init, static_argnames="train")
    variables = init(jax.random.PRNGKey(0), inputs, train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})

    # --- encoder (sparse eval head) -------------------------------------
    enc = ModifiedResnet()
    enc_vars = {"params": params["rgb_cam_extractor"],
                "batch_stats": stats.get("rgb_cam_extractor", {})}

    def run_enc(inp):
        return enc.apply(enc_vars, inp["rgb"], inp["choose"], False,
                         method=ModifiedResnet.sparse_points)

    dt = timed_chain(run_enc, inputs,
                     lambda o: jnp.sum(o[:, 0, :].astype(jnp.float32)) * 1e-9,
                     lambda x, acc: {**x, "rgb": x["rgb"] + acc * 1e-12})
    results["encoder_sparse"] = round(dt * 1e3, 3)

    # --- pointnet2 extractor ---------------------------------------------
    pn = PointNet2MSG(radii_list=CAM_RADII)
    pn_vars = {"params": params["pts_cam_extractor"],
               "batch_stats": stats.get("pts_cam_extractor", {})}

    def run_pn(inp):
        return pn.apply(pn_vars, inp["pts"], False)

    dt = timed_chain(run_pn, inputs,
                     lambda o: jnp.sum(o[:, 0, :].astype(jnp.float32)) * 1e-9,
                     lambda x, acc: {**x, "pts": x["pts"] + acc * 1e-12})
    results["pointnet2"] = round(dt * 1e3, 3)

    # --- implicit transform + heavy estimator tail -----------------------
    it_mod = ImplicitTransformation(6)
    it_vars = {"params": params["implicit_transform"],
               "batch_stats": stats.get("implicit_transform", {})}
    he = HeavyEstimator()
    he_vars = {"params": params["main_estimator"],
               "batch_stats": stats.get("main_estimator", {})}
    cd = precision.compute_dtype()
    tail_in = {
        "rgb_local": jnp.asarray(rng.randn(b, 1024, 128), cd),
        "pts_local": jnp.asarray(rng.randn(b, 1024, 128), cd),
        "pts": inputs["pts"],
        "cls": inputs["category_label"],
    }

    def run_tail(inp):
        pts_w, pts_w_local = it_mod.apply(
            it_vars, inp["rgb_local"], inp["pts_local"], inp["pts"], inp["cls"])
        r, t, s = he.apply(he_vars, inp["pts"], pts_w, inp["rgb_local"],
                           inp["pts_local"], pts_w_local)
        return t

    dt = timed_chain(run_tail, tail_in,
                     lambda o: jnp.sum(o[0].astype(jnp.float32)) * 1e-9,
                     lambda x, acc: {**x, "pts": x["pts"] + acc * 1e-12})
    results["implicit_plus_heavy"] = round(dt * 1e3, 3)

    results["sum"] = round(results["encoder_sparse"] + results["pointnet2"]
                           + results["implicit_plus_heavy"], 3)
    results["batch"] = b
    print(json.dumps(results))


if __name__ == "__main__":
    main()
