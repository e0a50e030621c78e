"""Dump the definition of a named fusion from the compiled train-step HLO.

The profiler occasionally shows hot fusions with no tf_op/source metadata
(e.g. ``fusion.15``); this compiles the exact train-step graph
``tools/profile_fwd.py --target train`` profiles and prints the requested
computation so the culprit ops are identifiable.

Usage: python tools/dump_fusion.py fusion.15 [--batch 24] [--out FILE]

CAVEAT (learned the hard way): runtime kernel names in the profiler trace
and instruction names in ``compiled.as_text()`` number INDEPENDENTLY — to
attribute a hot trace kernel, read the trace event's ``long_name`` (see
``istnet_tpu.utils.profiling.parse_trace`` rows), not this dump alone.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("name")
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--out", default="/tmp/train_step_hlo.txt")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from istnet_tpu.nn import precision
    precision.set_compute_dtype(jnp.bfloat16)

    import __graft_entry__ as g
    from train_bench import make_synth_raw_batch
    from istnet_tpu.data.device_augment import device_augment
    from istnet_tpu.data.device_preprocess import make_train_preprocess
    from istnet_tpu.models.ist_net import ISTNet, supervised_loss
    from istnet_tpu.train.train_state import (create_train_state, make_optimizer,
                                              make_train_step)
    from istnet_tpu.utils.config import Config

    model = ISTNet(nclass=6, freeze_world_enhancer=False)
    dummy = g._make_inputs(b=1, n=1024, img=192, train=True)
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dummy, train=True)
    cfg = Config({"optimizer": {"name": "Adam", "lr": 0.01, "weight_decay": 0},
                  "max_epoch": 30,
                  "bn": {"bn_momentum": 0.9, "bn_decay": 0.5,
                         "decay_step": 4000, "bnm_clip": 0.01}})
    tx, _ = make_optimizer(cfg, 4000, variables["params"])
    step_fn = make_train_step(
        model, lambda e, l: supervised_loss(e, l, 1.0, 10.0, False), tx,
        cfg.bn, augment_fn=lambda bt, r: device_augment(bt, r),
        preprocess_fn=make_train_preprocess())
    state = create_train_state(variables["params"], variables["batch_stats"], tx)
    batch = jax.tree_util.tree_map(jnp.asarray, make_synth_raw_batch(args.batch))
    rng_key = jax.random.PRNGKey(42)

    compiled = jax.jit(step_fn).lower(state, batch, rng_key).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"HLO written to {args.out} ({len(txt.splitlines())} lines)")

    # print the fused computation this fusion instruction calls; anchor so
    # %loop_fusion.15 cannot match a request for fusion.15
    m = re.search(rf'(?<![\w.]){re.escape(args.name)}\b[^\n]*calls=([%\w.\-]+)',
                  txt)
    if not m:
        print(f"{args.name}: no instruction found")
        return
    comp = m.group(1).lstrip("%")
    print(f"{args.name} calls computation {comp}\n")
    lines = txt.splitlines()
    printing = False
    depth = 0
    for ln in lines:
        if not printing and re.match(rf'\s*%?{re.escape(comp)}\b', ln.strip()) \
                and "{" in ln:
            printing = True
        if printing:
            print(ln)
            depth += ln.count("{") - ln.count("}")
            if depth <= 0:
                break


if __name__ == "__main__":
    main()
