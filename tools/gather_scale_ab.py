"""A/B: sparse-head patch-gather batch scaling (vmap vs 32-image chunks).

The round-4 eval profiles show the sparse head's 3x3-patch gather scaling
SUPERLINEARLY in batch (19.5 us/sample at B=32 vs 27.6 at B=64/128 — the
single biggest reason B=32 beats B=128 per sample). Per-image work is
batch-independent (1024 patch rows of 1.1 KB from a 1.18 MB source), so the
growth must come from XLA's lowering at larger batch. This tool times the
exact `_sparse_head` gather formulation (resnet_psp.py:318-326) standalone:

  (a) the production form:   jax.vmap(lax.gather) over the full batch
  (b) chunked:               lax.map over ceil(B/32) vmapped 32-image chunks

Timing: chained inside one jitted scan over pre-generated index sets (one
D2H scalar per chain — axon's block_until_ready does not block).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 50
ITERS = 3


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    hin = win = 96
    c = 64
    n = 1024

    def gather_patches(img, by, bx):
        starts = jnp.stack([by, bx], axis=-1)  # (N, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        return jax.lax.gather(img, starts, dn, slice_sizes=(3, 3, c),
                              mode=jax.lax.GatherScatterMode.CLIP)

    def form_vmap(h, by, bx):
        return jax.vmap(gather_patches)(h, by, bx)

    def form_chunked(h, by, bx, chunk=32):
        b = h.shape[0]
        if b <= chunk:
            return form_vmap(h, by, bx)
        nb = b // chunk
        hc = h.reshape(nb, chunk, hin, win, c)
        byc = by.reshape(nb, chunk, n)
        bxc = bx.reshape(nb, chunk, n)
        out = jax.lax.map(lambda t: form_vmap(*t), (hc, byc, bxc))
        return out.reshape(b, n, 3, 3, c)

    rng = np.random.RandomState(0)
    for b in (32, 64, 128):
        h = jnp.asarray(rng.randn(b, hin, win, c), jnp.bfloat16)
        # CHAIN distinct index sets so the scan body can't be hoisted
        by = jnp.asarray(rng.randint(0, hin - 3, (CHAIN, b, n)), jnp.int32)
        bx = jnp.asarray(rng.randint(0, win - 3, (CHAIN, b, n)), jnp.int32)

        for name, form in (("vmap", form_vmap), ("chunk32", form_chunked)):
            @jax.jit
            def chain(h, by, bx, form=form):
                def body(acc, idx):
                    p = form(h, idx[0], idx[1])
                    return acc + p.astype(jnp.float32).sum() * 1e-6, 0
                acc, _ = jax.lax.scan(body, jnp.float32(0), (by, bx))
                return acc

            float(chain(h, by, bx))  # compile + warm
            t0 = time.perf_counter()
            for _ in range(ITERS):
                float(chain(h, by, bx))
            dt = (time.perf_counter() - t0) / (ITERS * CHAIN)
            print(f"B={b:4d} {name:8s} {dt * 1e6:8.1f} us/call "
                  f"{dt / b * 1e6:6.2f} us/sample", flush=True)


if __name__ == "__main__":
    main()
