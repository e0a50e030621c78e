"""A/B: int8 vs bf16 conv/matmul throughput on this TPU chip.

Checks whether XLA lowers s8xs8->s32 convolutions and dot_generals to the
MXU's double-rate int8 path (v5e: ~394 TOPS int8 vs ~197 TFLOPs bf16).
If int8 is ~2x, a quantized serving mode for the ResNet/PSP convs is worth
building; if it falls back to upcasting, it is not.

Shapes mirror the eval-forward hot convs at B=128 (see tools/profile_fwd.py):
  - ResNet trunk 3x3 conv at 24x24x256   (the 181 TF/s blocks)
  - PSPUpsample 3x3 conv at 96x96        (the bandwidth-bound up2)
  - channel matmul 1024x512x512          (estimator MLPs)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAIN = 20
ITERS = 3


def timeit(fn, *args):
    # sync via a device-side scalar slice: float() on a full array would drag
    # it through the ~25 MB/s tunnel and swamp the measurement (CLAUDE.md)
    float(fn(*args).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(fn(*args).ravel()[0])
    return (time.perf_counter() - t0) / (ITERS * CHAIN)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    rng = np.random.default_rng(0)

    cases = [
        ("conv3x3 24x24x256->256 B=128", (128, 24, 24, 256), (3, 3, 256, 256)),
        ("conv3x3 96x96x64->64 B=128", (128, 96, 96, 64), (3, 3, 64, 64)),
        ("matmul (128*1024)x512x512", None, None),
    ]

    for name, xs, ws in cases:
        if xs is not None:
            x8 = jnp.asarray(rng.integers(-127, 127, xs, dtype=np.int8))
            w8 = jnp.asarray(rng.integers(-127, 127, ws, dtype=np.int8))
            xb = x8.astype(jnp.bfloat16)
            wb = w8.astype(jnp.bfloat16)
            dn = lax.conv_dimension_numbers(xs, ws, ("NHWC", "HWIO", "NHWC"))

            def convchain(x, w, acc_dtype):
                def body(i, x):
                    y = lax.conv_general_dilated(
                        x, w, (1, 1), "SAME", dimension_numbers=dn,
                        preferred_element_type=acc_dtype)
                    # renormalize so the chain doesn't overflow; cast back
                    return (y >> 7).astype(x.dtype) if acc_dtype == jnp.int32 \
                        else (y * jnp.bfloat16(1e-2)).astype(x.dtype)
                return lax.fori_loop(0, CHAIN, body, x)

            f8 = jax.jit(lambda x, w: convchain(x, w, jnp.int32))
            fb = jax.jit(lambda x, w: convchain(x, w, jnp.bfloat16))
            t8 = timeit(f8, x8, w8)
            tb = timeit(fb, xb, wb)
            flops = 2 * np.prod(xs) * ws[0] * ws[1] * ws[3]
        else:
            M, K, N = 128 * 1024, 512, 512
            x8 = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))
            w8 = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
            xb = x8.astype(jnp.bfloat16)
            wb = w8.astype(jnp.bfloat16)

            def dotchain(x, w, acc_dtype):
                def body(i, x):
                    y = lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                        preferred_element_type=acc_dtype)
                    return (y >> 7).astype(x.dtype) if acc_dtype == jnp.int32 \
                        else (y * jnp.bfloat16(1e-2)).astype(x.dtype)
                return lax.fori_loop(0, CHAIN, body, x)

            f8 = jax.jit(lambda x, w: dotchain(x, w, jnp.int32))
            fb = jax.jit(lambda x, w: dotchain(x, w, jnp.bfloat16))
            t8 = timeit(f8, x8, w8)
            tb = timeit(fb, xb, wb)
            flops = 2 * M * K * N

        print(f"{name}: int8 {t8*1e6:8.1f} us ({flops/t8/1e12:6.1f} TOP/s)  "
              f"bf16 {tb*1e6:8.1f} us ({flops/tb/1e12:6.1f} TF/s)  "
              f"speedup {tb/t8:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
