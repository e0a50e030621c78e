"""Primitive layers: torch-init convs/dense, BatchNorm, PReLU, spatial dropout, resize.

These match the reference's layer semantics (PyTorch defaults) so that training
dynamics are comparable:

- ``TorchConv`` / ``TorchDense``: kaiming-uniform(a=sqrt(5)) weights and
  uniform(±1/sqrt(fan_in)) bias — torch's nn.Conv2d/nn.Linear defaults.
- ``BatchNorm``: torch semantics (biased variance for normalization, unbiased
  for the running-stat update, eps 1e-5). In train mode it normalizes by batch
  stats and *publishes* them to the mutable ``bn_batch`` collection; the train
  step performs ``running = (1-m)*running + m*batch`` with the scheduled
  momentum m (reference ``utils/scheduler.py:284-303`` mutates module momentum
  in place; here the schedule lives functionally in the train loop).
- ``PReLU``: single shared slope, init 0.25 (torch nn.PReLU default).
- ``Dropout2d``: drops whole channels (torch nn.Dropout2d).
- ``resize_bilinear``: align_corners=False (jax.image) and a separable
  align_corners=True variant (reference ``model/modules.py:41`` uses both).

All layers are channel-last (NHWC / (B, N, C)).
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from istnet_tpu.nn.precision import compute_dtype

Array = jax.Array


def _kaiming_uniform_a5(key, shape, dtype=jnp.float32):
    """torch default conv/linear weight init: kaiming_uniform(a=sqrt(5)).

    For flax kernel shapes (..., in, out): fan_in = prod(spatial) * in.
    bound = sqrt(6 / ((1 + a^2) * fan_in)) = sqrt(1 / fan_in).
    """
    fan_in = int(np.prod(shape[:-1]))
    bound = float(np.sqrt(1.0 / fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _uniform_bias(fan_in: int) -> Callable:
    bound = float(np.sqrt(1.0 / fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _ConvParams(nn.Module):
    """Holds a conv's kernel/bias under the same scope/param names nn.Conv
    would create ("Conv_0/kernel", "Conv_0/bias") so checkpoints, the torch
    weight converter, and RNG-derived initial values are unchanged."""

    kshape: tuple  # (kh, kw, in, out)
    use_bias: bool

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _kaiming_uniform_a5, self.kshape)
        if not self.use_bias:
            return k, None
        fan_in = int(np.prod(self.kshape[:-1]))
        b = self.param("bias", _uniform_bias(fan_in), (self.kshape[-1],))
        return k, b


class TorchConv(nn.Module):
    """NHWC conv with torch-default init. 'SAME'-style explicit padding."""

    features: int
    kernel_size: tuple[int, int] = (1, 1)
    strides: tuple[int, int] = (1, 1)
    padding: int | Sequence[tuple[int, int]] = 0
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, padding: int | None = None,
                 fold_resize2: bool = False,
                 fold_kernel: bool = False,
                 fold_epilogue: Array | None = None) -> Array:
        """``padding`` overrides the attribute at call time (same parameters;
        used by the sparse point-decode path to run a padded conv on
        pre-extracted patches with padding 0).

        ``fold_resize2``: treat ``x`` as the PRE-upsample map and compute
        ``conv(resize_bilinear_align_corners(x, 2h, 2w))`` without
        materializing the resized map — see ``conv3x3_on_doubled``.

        ``fold_kernel``: additionally allow the fused eval-only Pallas kernel
        for the fold on TPU (no VJP — pass ``not train``).

        ``fold_epilogue``: (5, cout) f32 eval-BN+PReLU rows fused into the
        kernel's output write (see ``dispatch.fold_upsample_conv``); the
        caller must have checked ``dispatch.fold_upsample_kernel_ok`` — if
        the kernel is not taken the epilogue is NOT applied here.
        """
        in_ch = x.shape[-1]
        dt = compute_dtype()
        k, b = _ConvParams(
            (self.kernel_size[0], self.kernel_size[1], in_ch, self.features),
            self.use_bias, name="Conv_0")()
        x = x.astype(dt)
        k = k.astype(dt)
        b = None if b is None else b.astype(dt)
        if fold_resize2:
            if (self.kernel_size != (3, 3) or self.strides != (1, 1)
                    or self.dilation != 1
                    or (self.padding if padding is None else padding) != 1):
                raise ValueError("fold_resize2 needs a 3x3/stride-1/pad-1 conv")
            if fold_kernel:
                from istnet_tpu.ops import dispatch
                out = dispatch.fold_upsample_conv(x, k, b,
                                                  epilogue=fold_epilogue)
                if out is not None:
                    return out
            return conv3x3_on_doubled(x, k, b)
        pad = self.padding if padding is None else padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        out = lax.conv_general_dilated(
            x, k, window_strides=self.strides, padding=pad,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out if b is None else out + b


class TorchDense(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            dtype=compute_dtype(),
            kernel_init=_kaiming_uniform_a5,
            bias_init=_uniform_bias(x.shape[-1]),
        )(x)


class BatchNorm(nn.Module):
    """Channel-last batch norm with torch semantics and external EMA update.

    Collections:
      params       — scale (init 1), bias (init 0)   (pytorch_utils.py:53-59)
      batch_stats  — running mean/var used at eval
      bn_batch     — this step's batch mean / unbiased var, published in train
                     mode for the train loop's scheduled-momentum EMA update.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if train:
            axes = tuple(range(x.ndim - 1))
            count = int(np.prod([x.shape[a] for a in axes]))
            # Stats run in f32 for f32/bf16 compute; f64 inputs keep f64 so
            # double-precision torch-vs-flax parity runs are exact (the old
            # always-f32 stats gave ~1e-3 relative var error on SA-stage
            # rel-xyz activations where mean >> std — one-pass E[x^2]-E[x]^2
            # cancellation — which the f64 full-model gradient parity test
            # surfaced as ~5% pose drift).
            sdt = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
            xs = x.astype(sdt)
            if sdt == jnp.float64:
                # SHIFTED one-pass variance E[(x-c)^2] - E[x-c]^2, origin c =
                # the first batch row's channel mean: shrinks the
                # cancellation term from (mean^2/var)*eps to ~eps/n, belt-
                # and-braces on top of f64. Exact math is c-independent, so
                # gradients equal torch's two-pass form; stop_gradient(c)
                # prunes autodiff's cancelling-but-costly c terms. f64-ONLY:
                # on the production path this same formulation measured
                # +3.6 ms (6%) on the B=24 TPU train step (58.9-59.3 ->
                # 62.7-63.3 ms; the c0 reduce serializes ahead of ~50 BN
                # reduction fusions) — as costly as torch's two-pass
                # (+2.8 ms) — buying precision below the bf16 activations'
                # own ~1e-2 quantization. (A running-mean origin was tried
                # and rejected: converted EMAs can sit arbitrarily far from
                # the batch mean — the torch-vs-flax forward test caught 5%
                # pose drift.)
                c0 = lax.stop_gradient(jnp.mean(xs[:1], axes))
                d = xs - c0
                dmean = jnp.mean(d, axes)
                var = jnp.maximum(
                    jnp.mean(jnp.square(d), axes) - jnp.square(dmean), 0.0)
                mean = dmean + c0
            else:
                mean = jnp.mean(xs, axes)
                var = jnp.maximum(
                    jnp.mean(jnp.square(xs), axes) - jnp.square(mean), 0.0)
            if self.is_mutable_collection("bn_batch"):
                bm = self.variable("bn_batch", "mean", lambda: jnp.zeros((c,), jnp.float32))
                bv = self.variable("bn_batch", "var", lambda: jnp.ones((c,), jnp.float32))
                # published in the stats dtype (f32 in production; f64 under
                # x64 so optimizer-trajectory parity runs stay double)
                bm.value = mean.astype(sdt)
                # torch tracks the *unbiased* variance in running_var
                bv.value = (var * (count / max(count - 1, 1))).astype(sdt)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class PReLU(nn.Module):
    """Single-parameter PReLU (torch nn.PReLU() default, init 0.25)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        alpha = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class Dropout2d(nn.Module):
    """Channel dropout for NHWC maps (torch nn.Dropout2d).

    Implemented as a multiply by a pre-scaled (B, 1, 1, C) mask rather than
    flax nn.Dropout's broadcast-pred ``select``: in the train-step backward,
    XLA materialized the pred broadcast into the conv-chosen tiled layout at
    ~11 GB/s (profiled 1.7 ms on a (24, 96, 96, 64) cotangent — the single
    worst unattributed fusion); the bf16 multiply fuses cleanly in both
    directions. Same keep probability and zero/scale semantics as torch
    nn.Dropout2d; the bernoulli draw uses the same 'dropout' RNG collection
    (the random stream differs from nn.Dropout's, which only permutes which
    channels drop — dropout carries no golden-value contract).
    """

    rate: float

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        if not train or self.rate == 0.0:
            return x
        if self.rate >= 1.0:  # torch/flax zero everything; 1/keep_p would NaN
            return jnp.zeros_like(x)
        keep_p = 1.0 - self.rate
        b, _, _, c = x.shape
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep_p, (b, 1, 1, c))
        return x * (mask.astype(x.dtype) * jnp.asarray(1.0 / keep_p, x.dtype))


# ---------------------------------------------------------------------------
# Resizing
# ---------------------------------------------------------------------------

def resize_bilinear(x: Array, out_h: int, out_w: int) -> Array:
    """align_corners=False bilinear (torch F.interpolate default). NHWC."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_h, out_w, c), method="bilinear")


def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) align-corners linear interpolation matrix.

    Built in f64 so f64 parity runs keep full precision (f32-rounded weights
    shifted encoder outputs by ~1e-7, enough to flip downstream relu masks in
    the double-precision torch-vs-flax test). The production f32 cast differs
    from matrices built directly in f32 by at most 1 ulp (~6e-8) at some
    sizes — round_f32(1 - w_f64) != 1 - round_f32(w) — and is the MORE
    accurate of the two; don't rely on bit-stable resize outputs across this
    construction change."""
    a = np.zeros((out_size, in_size), np.float64)
    if in_size == 1:
        a[:, 0] = 1.0
        return a
    pos = np.linspace(0.0, in_size - 1.0, out_size)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w = pos - lo
    rows = np.arange(out_size)
    np.add.at(a, (rows, lo), 1.0 - w)
    np.add.at(a, (rows, hi), w)
    return a


def resize_bilinear_align_corners(x: Array, out_h: int, out_w: int) -> Array:
    """align_corners=True bilinear as two MXU contractions. NHWC.

    Matches torch nn.Upsample(scale_factor=2, mode='bilinear',
    align_corners=True) as used by PSPUpsample (modules.py:41). Separable
    interpolation matrices turn the resize into matmuls — gather-based
    lowering is ~10x slower on TPU (measured 39.7 vs ~1 ms at up_1's shape).
    """
    _, h, w, _ = x.shape
    ah = jnp.asarray(_interp_matrix(h, out_h), x.dtype)
    aw = jnp.asarray(_interp_matrix(w, out_w), x.dtype)
    y = jnp.einsum("ih,bhwc->biwc", ah, x)
    return jnp.einsum("jw,biwc->bijc", aw, y)


def _shifted_interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, 3, in) stack of the align-corners interp matrix shifted by the
    three 3x3-conv row taps dy-1 ∈ {-1, 0, +1}, zero rows for the conv's
    zero padding: ``S[i, dy] = A[i + dy - 1]`` (zeros outside [0, out))."""
    a = _interp_matrix(in_size, out_size)
    a_pad = np.concatenate(
        [np.zeros((1, in_size), a.dtype), a,
         np.zeros((1, in_size), a.dtype)], axis=0)
    return np.stack([a_pad[d:d + out_size] for d in range(3)], axis=1)


def conv3x3_on_doubled(x: Array, k: Array, b: Array | None) -> Array:
    """``conv3x3(pad=1)(resize_bilinear_align_corners(x, 2h, 2w))`` computed
    as (1) ONE (Cin, 9*Cout) matmul at the LOW resolution and (2) the x2
    resize folded into shifted separable interpolation matrices.

    Convolving after upsampling recomputes each low-res contraction ~4x
    (output pixels share lerp sources); reassociating by linearity does the
    channel contraction once per low-res pixel per tap — exactly 4x fewer
    conv FLOPs (measured 8.3 ms -> ~2 ms for up_1 at B=128) and the 4x-larger
    resized tensor never exists. Exact up to float reassociation.

    ``x`` (B, h, w, Cin); ``k`` (3, 3, Cin, Cout) HWIO; returns (B, 2h, 2w, Cout).
    """
    bsz, h, w, cin = x.shape
    cout = k.shape[-1]
    km = jnp.transpose(k, (2, 0, 1, 3)).reshape(cin, 9 * cout)
    y = (x.reshape(-1, cin) @ km).reshape(bsz, h, w, 3, 3, cout)
    s_y = jnp.asarray(_shifted_interp_matrix(h, 2 * h), x.dtype)   # (2h, 3, h)
    s_x = jnp.asarray(_shifted_interp_matrix(w, 2 * w), x.dtype)   # (2w, 3, w)
    t = jnp.einsum("idh,bhwdec->biwec", s_y, y)
    out = jnp.einsum("jew,biwec->bijc", s_x, t)
    return out if b is None else out + b


def adaptive_avg_pool(x: Array, out_size: int) -> Array:
    """NHWC adaptive average pool to (out_size, out_size).

    Requires divisible spatial dims (true for the 192-crop pipeline: PSP sees
    24x24 and pools to 1/2/3/6 — modules.py:11,23).
    """
    _, h, w, _ = x.shape
    if h % out_size or w % out_size:
        raise ValueError(f"adaptive_avg_pool needs divisible sizes, got {h}x{w} -> {out_size}")
    kh, kw = h // out_size, w // out_size
    return nn.avg_pool(x, (kh, kw), strides=(kh, kw))
