"""Fused Pallas TPU kernel for the fold-upsample conv (PSPUpsample stages).

Computes ``conv3x3(pad=1)(resize_x2_align_corners(x)) + b`` — the op
``nn/layers.py::conv3x3_on_doubled`` evaluates with three XLA contractions —
entirely in VMEM per image block, so the 9-tap low-res intermediate (9x the
input, 339 MB at up2's eval shape) and the row-contracted tensor never reach
HBM. Reference semantics: ``model/modules.py:37-48`` (PSPUpsample = x2
bilinear align_corners=True then Conv2d(3x3, pad 1)).

Profiled motivation (B=128 eval forward): the XLA fold's channel matmul runs
at 29 TF/s / 390 GB/s — bandwidth-bound writing the 9x intermediate — and the
up2 stage totals ~5.6 ms. Speed-of-light for the fused form is the input
read + output write (2.2 MB/image at up2) plus ~1.1 GFLOP/image of MXU work.

Lowering notes (hardware-verified on v5e Mosaic):
- Batched ``dot_general`` (leading batch dim, broadcast LHS) lowers fine;
  contracting the *leading* dim of both operands does not, nor do reshapes
  that move a sublane dim into lanes, nor 4D ``swapaxes(1, 2)``.
- The kernel takes the image block pre-transposed to w-major (one cheap XLA
  transpose of the small low-res input) so both upsample contractions are
  batched dots that land directly in (i, j, c) output order:
    stage 0  Y_d = X(ipb*w*h, cin) @ KM_d(cin, 3cout)      [3 block-wide dots]
    stage 1  V_d = SY_d(2h, h) x_h Y_d                     [batch ipb*w]
    stage 2  out = sum_e SX_e(2w, w) x_w VT_e              [batch ipb*2h]
  where SY/SX are the shifted align-corners interp matrices of
  ``nn/layers.py::_shifted_interp_matrix``, and VT is V re-laid per image
  from (w, 2h, *) to (2h, w, *) via a per-image 3D swap into VMEM scratch
  (the only relayout Mosaic supports here).
- Stage-1 results accumulate in f32 and are rounded to the compute dtype
  once, matching the XLA einsum's single rounding of its (d, h) contraction.

Eval-only: no custom VJP (the training path keeps the differentiable XLA
fold; ``nn/layers.py::TorchConv`` gates on ``fold_kernel=not train``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from istnet_tpu.nn.layers import _shifted_interp_matrix

Array = jax.Array


def _kernel(xt_ref, km_ref, sy_ref, sx_ref, b_ref, ep_ref, o_ref, v_ref,
            vt_ref, *, epilogue: bool):
    ipb, w, h, cin = xt_ref.shape          # w-major input block
    _, hh, ww, cout = o_ref.shape          # (2h, 2w)
    tc = 3 * cout
    dt = xt_ref.dtype

    xm = xt_ref[:].reshape(ipb * w * h, cin)
    v = jnp.zeros((ipb * w, hh, tc), jnp.float32)
    for d in range(3):
        yd = jnp.dot(xm, km_ref[d], preferred_element_type=jnp.float32)
        yd = yd.astype(dt).reshape(ipb * w, h, tc)
        syb = jnp.broadcast_to(sy_ref[d][None], (ipb * w, hh, h))
        v = v + lax.dot_general(
            syb, yd, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    v_ref[:] = v.astype(dt)                 # one rounding, like the einsum

    def swap_image(img, carry):
        vi = v_ref[pl.ds(img * w, w)]       # (w, hh, tc)
        vt_ref[pl.ds(img, 1)] = jnp.swapaxes(vi, 0, 1)[None]
        return carry

    lax.fori_loop(0, ipb, swap_image, 0)

    vt = vt_ref[:].reshape(ipb * hh, w, tc)
    out = jnp.zeros((ipb * hh, ww, cout), jnp.float32)
    for e in range(3):
        sxb = jnp.broadcast_to(sx_ref[e][None], (ipb * hh, ww, w))
        out = out + lax.dot_general(
            sxb, vt[:, :, e * cout:(e + 1) * cout],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    out = out + b_ref[:].astype(jnp.float32).reshape(1, 1, cout)
    if epilogue:
        # BN-eval affine + PReLU fused into the output write: XLA cannot fuse
        # elementwise consumers INTO a pallas_call, so without this the
        # (B, 2h, 2w, cout) conv output pays a full extra HBM read+write for
        # the BN/PReLU pass (profiled 354 us at B=32 / 922 us at B=64 on the
        # eval forward). Each step mirrors the unfused op order bit-exactly:
        # conv output materialized in the compute dtype (conv3x3_on_doubled's
        # final cast), BN's (x-mean)*invstd then *scale+bias in f32
        # (nn/layers.py BatchNorm eval), one cast, PReLU in the compute
        # dtype (nn/layers.py PReLU).
        ob = out.astype(o_ref.dtype).astype(jnp.float32)
        t = (ob - ep_ref[0].reshape(1, 1, cout)) * ep_ref[1].reshape(1, 1, cout)
        t = t * ep_ref[2].reshape(1, 1, cout) + ep_ref[3].reshape(1, 1, cout)
        tb = t.astype(o_ref.dtype)
        # PReLU compare/multiply staged through f32: Mosaic v5e has no bf16
        # vector cmpf, and XLA's own bf16 arithmetic IS upcast-compute-round,
        # so this is the bit-exact restatement of where(x>=0, x, alpha*x)
        tf = tb.astype(jnp.float32)
        alpha = ep_ref[4].reshape(1, 1, cout).astype(o_ref.dtype)
        neg = (alpha.astype(jnp.float32) * tf).astype(o_ref.dtype)
        out_e = jnp.where(tf >= 0, tb, neg)
        o_ref[:] = out_e.reshape(ipb, hh, ww, cout)
    else:
        o_ref[:] = out.astype(o_ref.dtype).reshape(ipb, hh, ww, cout)


def _images_per_block(b: int, h: int, w: int, cin: int, cout: int,
                      itemsize: int) -> int:
    """Largest block size keeping the f32 stage buffers + DMA windows under
    the VMEM budget; per-image f32 live set is ~(4*2h*w*3cout + 4*2h*2w*cout)
    bytes plus the in/out blocks."""
    import os
    force = os.environ.get("ISTNET_FOLD_IPB")
    if force:
        return int(force)
    # MEASURED (round 5, up2 production shape 48x48x256->64, device-time
    # profiles): ipb 4 -> 2 -> 1 monotonically improves the kernel — B=32
    # 948 -> 881 -> 771 us, B=128 4.13 -> 3.82 -> 3.48 ms (full forward
    # 10.76 -> 10.58 and 45.52 -> 44.86 ms). Same story as the rejected
    # FP-kernel ipb A/B: coarser blocks hurt DMA/compute overlap more than
    # they amortize per-program cost. One image per program is the default;
    # ISTNET_FOLD_IPB overrides for future shapes.
    return 1


@functools.partial(jax.jit, static_argnums=(3,))
def fold_upsample_conv_pallas(x: Array, k: Array, b: Array | None,
                              interpret: bool = False,
                              epilogue: Array | None = None) -> Array:
    """``(B, h, w, cin), (3, 3, cin, cout) HWIO -> (B, 2h, 2w, cout)``.

    Equals ``conv3x3_on_doubled(x, k, b)`` up to f32-accumulation rounding.

    ``epilogue``: optional ``(5, cout)`` f32 rows ``[mean, invstd, scale,
    bias, alpha]`` applying eval-BN + PReLU inside the output write (the
    PSPUpsample tail, reference ``modules.py:37-48``) — bit-identical to the
    unfused BN/PReLU applied to this kernel's output.
    """
    bsz, h, w, cin = x.shape
    if k.shape[:2] != (3, 3):
        raise ValueError(f"fold_upsample_conv_pallas needs a 3x3 kernel, got {k.shape}")
    cout = k.shape[-1]
    dt = x.dtype
    # (3, cin, 3*cout): KM_d columns ordered (e, c), c innermost
    km = jnp.transpose(k, (0, 2, 1, 3)).reshape(3, cin, 3 * cout).astype(dt)
    sy = jnp.asarray(np.transpose(_shifted_interp_matrix(h, 2 * h), (1, 0, 2)), dt)
    sx = jnp.asarray(np.transpose(_shifted_interp_matrix(w, 2 * w), (1, 0, 2)), dt)
    bias = (jnp.zeros((1, cout), jnp.float32) if b is None
            else b.reshape(1, cout).astype(jnp.float32))
    has_ep = epilogue is not None
    ep = (jnp.zeros((5, cout), jnp.float32) if epilogue is None
          else epilogue.astype(jnp.float32))
    if ep.shape != (5, cout):
        raise ValueError(f"epilogue must be (5, {cout}), got {ep.shape}")

    xt = jnp.swapaxes(x, 1, 2)  # w-major images (cheap: low-res input)
    ipb = _images_per_block(bsz, h, w, cin, cout, x.dtype.itemsize)
    grid = (bsz // ipb,)
    return pl.pallas_call(
        functools.partial(_kernel, epilogue=has_ep),
        out_shape=jax.ShapeDtypeStruct((bsz, 2 * h, 2 * w, cout), dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ipb, w, h, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cin, 3 * cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 2 * h, h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 2 * w, w), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ipb, 2 * h, 2 * w, cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ipb * w, 2 * h, 3 * cout), dt),
                        pltpu.VMEM((ipb, 2 * h, w, 3 * cout), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(xt, km, sy, sx, bias, ep)
