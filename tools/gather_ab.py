"""A/B the sparse-head 3x3-patch gather formulations on the real TPU.

The eval forward's #3 hotspot is gathering (3, 3, 64) patches for 1024 points
per image from the 96x96x64 up2 map (profiled 3.5 ms @ 86 GB/s at B=128).
Variants measured here (all produce identical (B, N, 3, 3, C) patches):

  slice33   current: lax.gather of (3, 3, C) slices, starts (by, bx)
  slice3w   lax.gather of (3, 3*C) slices from the (H, W*C) reshaped map
  take9     9 flat row-gathers from (H*W, C) via vmap(jnp.take)
  unfold    column-unfold to (H, W, 3C) (3 shifted copies) then (3, 3C) slices

Run: python tools/gather_ab.py [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H = W = 96
C = 64
N = 1024
CHAIN = 20


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()
    b = args.batch

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(b, H, W, C).astype(np.float32),
                      jnp.bfloat16)
    by = jnp.asarray(rng.randint(0, H - 2, (b, N)), jnp.int32)
    bx = jnp.asarray(rng.randint(0, W - 2, (b, N)), jnp.int32)

    def slice33(img, by, bx):
        def one(im, y, x):
            starts = jnp.stack([y, x], axis=-1)
            dn = lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1))
            return lax.gather(im, starts, dn, slice_sizes=(3, 3, C),
                              mode=lax.GatherScatterMode.CLIP)
        return jax.vmap(one)(img, by, bx)

    def slice3w(img, by, bx):
        imf = img.reshape(b, H, W * C)
        def one(im, y, x):
            starts = jnp.stack([y, x * C], axis=-1)
            dn = lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0, 1))
            return lax.gather(im, starts, dn, slice_sizes=(3, 3 * C),
                              mode=lax.GatherScatterMode.CLIP)
        return jax.vmap(one)(imf, by, bx).reshape(b, N, 3, 3, C)

    def take9(img, by, bx):
        imf = img.reshape(b, H * W, C)
        rows = (by[..., None] + jnp.arange(3, dtype=jnp.int32))  # (B, N, 3)
        cols = (bx[..., None] + jnp.arange(3, dtype=jnp.int32))
        flat = (rows[..., :, None] * W + cols[..., None, :]).reshape(b, N * 9)
        out = jax.vmap(lambda im, ix: jnp.take(im, ix, axis=0))(imf, flat)
        return out.reshape(b, N, 3, 3, C)

    def unfold(img, by, bx):
        shifted = [img]
        shifted.append(jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2))
        shifted.append(jnp.concatenate([img[:, :, 2:], img[:, :, -2:]], axis=2))
        s = jnp.concatenate(shifted, axis=-1)          # (B, H, W, 3C)
        sf = s.reshape(b, H, W * 3 * C)
        def one(im, y, x):
            starts = jnp.stack([y, x * 3 * C], axis=-1)
            dn = lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0, 1))
            return lax.gather(im, starts, dn, slice_sizes=(3, 3 * C),
                              mode=lax.GatherScatterMode.CLIP)
        return jax.vmap(one)(sf, by, bx).reshape(b, N, 3, 3, C)

    variants = {"slice33": slice33, "slice3w": slice3w, "take9": take9,
                "unfold": unfold}
    outs = {}
    for name, fn in variants.items():
        @jax.jit
        def chain(img, by, bx, fn=fn):
            def body(i, acc):
                p = fn(img, by + (acc.astype(jnp.int32) % 2), bx)
                return acc + p.astype(jnp.float32)[0, 0, 0, 0, 0] * 1e-6
            return lax.fori_loop(0, CHAIN, body, jnp.float32(0))

        _ = float(chain(img, by, bx))  # compile+warm
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            _ = float(chain(img, by, bx))
        dt = (time.perf_counter() - t0) / (reps * CHAIN)
        gb = b * N * 9 * C * 2 / 1e9
        outs[name] = dt
        print(f"{name:8s} {dt * 1e3:7.2f} ms  {gb / dt:6.1f} GB/s")

    # correctness cross-check (interior points only; edge semantics differ
    # for unfold's clamp — production bases are pre-clamped to interior)
    a = np.asarray(slice33(img, by, bx), np.float32)
    for name in ("slice3w", "take9", "unfold"):
        v = np.asarray(variants[name](img, by, bx), np.float32)
        np.testing.assert_allclose(v, a)
    print("parity ok")


if __name__ == "__main__":
    main()
