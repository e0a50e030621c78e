import os, sys, time, collections
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
from istnet_tpu.nn import precision
precision.set_compute_dtype(jnp.bfloat16)
import __graft_entry__ as g
from train_bench import make_synth_raw_batch
from istnet_tpu.data.device_augment import device_augment
from istnet_tpu.data.device_preprocess import make_train_preprocess
from istnet_tpu.models.ist_net import ISTNet, supervised_loss
from istnet_tpu.train.train_state import create_train_state, make_optimizer, make_train_step
from istnet_tpu.utils.config import Config

model = ISTNet(nclass=6, freeze_world_enhancer=False)
dummy = g._make_inputs(b=1, n=1024, img=192, train=True)
variables = jax.jit(model.init, static_argnames="train")(
    {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, dummy, train=True)
cfg = Config({"optimizer": {"name": "Adam", "lr": 0.01, "weight_decay": 0},
              "max_epoch": 30,
              "bn": {"bn_momentum": 0.9, "bn_decay": 0.5, "decay_step": 4000,
                     "bnm_clip": 0.01}})
tx, _ = make_optimizer(cfg, 4000, variables["params"])
step_fn = make_train_step(model, lambda e, l: supervised_loss(e, l, 1.0, 10.0, False),
                          tx, cfg.bn, augment_fn=lambda bt, r: device_augment(bt, r),
                          preprocess_fn=make_train_preprocess())
state0 = create_train_state(variables["params"], variables["batch_stats"], tx)
batches = [jax.tree_util.tree_map(jnp.asarray, make_synth_raw_batch(24, seed=s))
           for s in range(4)]
rng = jax.random.PRNGKey(42)
jstep = jax.jit(step_fn, donate_argnums=(0,))

def run(depth, iters=30):
    # fresh buffer copies: jstep donates the state, which would invalidate
    # the shared `variables` arrays for the next run
    p = jax.tree_util.tree_map(jnp.array, variables["params"])
    bs = jax.tree_util.tree_map(jnp.array, variables["batch_stats"])
    state = create_train_state(p, bs, tx)
    infl = collections.deque()
    # warmup
    state, m = jstep(state, batches[0], rng)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = jstep(state, batches[i % 4], jax.random.fold_in(rng, i))
        infl.append(m)
        while len(infl) > depth:
            _ = float(infl.popleft()["loss"])
    while infl:
        _ = float(infl.popleft()["loss"])
    return (time.perf_counter() - t0) / iters

for depth in (0, 1, 2, 4):
    dt = run(depth)
    print(f"depth={depth}: {dt*1e3:7.2f} ms/step ({24/dt:7.1f} samples/s)", flush=True)
