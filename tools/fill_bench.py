"""A/B the depth-fill implementations on the real TPU at train shapes.

Times the fused Pallas kernel (optionally with a median chunk-width sweep)
against the XLA pipeline at (24, 480, 640).

Run: python tools/fill_bench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W = 24, 480, 640
CHAIN = 10
ITERS = 3


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from istnet_tpu.data.device_preprocess import fill_in_multiscale_tpu
    from istnet_tpu.ops import depth_fill_pallas as dfp

    rng = np.random.RandomState(0)
    d = rng.uniform(0.3, 2.8, size=(B, H, W)).astype(np.float32)
    d[rng.rand(B, H, W) < 0.35] = 0.0
    d[:, :80] = 0.0
    depth = jnp.asarray(d)

    def timeit(name, fn):
        @jax.jit
        def chain(x):
            def body(i, acc):
                out = fn(x + acc * 1e-12)
                return acc + out[0, 0, 0] * 1e-9
            return lax.fori_loop(0, CHAIN, body, jnp.float32(0))

        try:
            _ = float(chain(depth))
            _ = float(chain(depth))
            t0 = time.perf_counter()
            for _ in range(ITERS):
                _ = float(chain(depth))
            dt = (time.perf_counter() - t0) / (ITERS * CHAIN)
            print(f"{name:22s} {dt * 1e3:7.2f} ms")
        except Exception as e:
            print(f"{name:22s} FAILED {type(e).__name__}: {str(e)[:140]}")

    timeit("xla_pipeline", lambda x: fill_in_multiscale_tpu(x))
    for chunk in (128, 64, 256):
        dfp._CHUNK = chunk
        timeit(f"pallas_chunk{chunk}",
               lambda x: dfp.fill_in_multiscale_pallas.__wrapped__(x, 3.0, False))
    dfp._CHUNK = 128


if __name__ == "__main__":
    main()
