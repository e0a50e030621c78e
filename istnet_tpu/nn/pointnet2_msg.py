"""PointNet++ multi-scale-grouping feature extractor as one XLA graph.

Rebuild of the reference's torch modules (``model/pointnet2/pointnet2_modules.py``
+ the MSG network spec in ``model/modules.py:244-327``): 4 set-abstraction
stages (npoint 512/256/128/64, dual radii with nsample 16/32) and 4 feature-
propagation stages back to N points, yielding 128-d per-point features.

TPU-native design: every SA/FP stage is ordinary XLA (gathers, 1x1-conv MLPs
that map onto the MXU, max-pool reductions) around the fused Pallas FPS
kernel — no per-op kernel launches; the whole extractor fuses into the
enclosing jit graph. Layout is channel-last throughout: xyz ``(B, N, 3)``,
features ``(B, N, C)`` (the reference uses ``(B, C, N)``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from istnet_tpu import ops
from istnet_tpu.nn.layers import BatchNorm, TorchDense
from istnet_tpu.nn.precision import compute_dtype

Array = jax.Array


class SharedMLP(nn.Module):
    """Per-point MLP: 1x1 conv + BN + ReLU per layer (pytorch_utils.py:25-50).

    A 1x1 conv over channel-last data is a Dense on the last axis — one MXU
    matmul per layer, batched over all leading dims.
    """

    channels: Sequence[int]
    bn: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        for c in self.channels:
            x = TorchDense(c)(x)
            if self.bn:
                x = BatchNorm()(x, train)
            x = nn.relu(x)
        return x


def _fold_shared_mlp(sm: "SharedMLP", nlayers: int, eps: float = 1e-5):
    """Eval-BN folding of a SharedMLP's layers: per layer (W', b') with
    ``W' = W * scale/sqrt(var+eps)`` and ``b' = (b - mean)*scale/sqrt(var+eps)
    + bias`` — so ``relu(x @ W' + b') == relu(BN_eval(x @ W + b))``.
    Returns None when the variables are absent (fresh init path)."""
    v = sm.variables
    if "params" not in v or "batch_stats" not in v:
        return None
    p, bs = v["params"], v["batch_stats"]
    layers = []
    for i in range(nlayers):
        k = p[f"TorchDense_{i}"]["Dense_0"]["kernel"]
        b = p[f"TorchDense_{i}"]["Dense_0"]["bias"]
        scale = p[f"BatchNorm_{i}"]["scale"]
        bias = p[f"BatchNorm_{i}"]["bias"]
        mean = bs[f"BatchNorm_{i}"]["mean"]
        var = bs[f"BatchNorm_{i}"]["var"]
        kbn = scale * jax.lax.rsqrt(var + eps)
        layers.append((k * kbn[None, :], (b - mean) * kbn + bias))
    return tuple(layers)


class PointnetSAModuleMSG(nn.Module):
    """Set abstraction with multi-scale grouping (pointnet2_modules.py:22-114).

    FPS -> gather centroids -> per-radius {ball query -> group -> concat
    [relative xyz, features] -> SharedMLP -> max over samples} -> concat scales.
    """

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz: Array, features: Array | None, train: bool):
        fps_idx = ops.furthest_point_sample(xyz, self.npoint)
        new_xyz = ops.gather_points(xyz, fps_idx)  # (B, npoint, 3)

        mlp_mods = [SharedMLP(mlp) for mlp in self.mlps]

        # eval on TPU: the whole stage (query+group+BN-folded MLP+max) runs
        # as ONE Pallas kernel — the (B, np, ns, C) grouped tensor and the
        # MLP activations never reach HBM. Training keeps the unfused path
        # (BN batch stats + custom VJP). Gated on the bf16 compute policy:
        # the kernel's MLP runs bf16 regardless, so taking it under an f32
        # policy would silently downgrade an f32 parity/accuracy run.
        if (not train and not self.is_initializing() and self.use_xyz
                and compute_dtype() == jnp.bfloat16):
            folded = [_fold_shared_mlp(sm, len(mlp))
                      for sm, mlp in zip(mlp_mods, self.mlps)]
            if all(f is not None for f in folded):
                fused = ops.sa_msg_fused(self.radii, self.nsamples, xyz,
                                         new_xyz, features, folded)
                if fused is not None:
                    return new_xyz, jnp.concatenate(
                        [f.astype(compute_dtype()) for f in fused], axis=-1)

        # one fused kernel computes ALL radius scales' grouped tensors
        # ([rel_xyz, feats] at the first-nsample in-radius points) directly —
        # the neighbor-index tensor and the grouping gathers never exist; it
        # emits the compute dtype (the SharedMLP's Dense would cast anyway —
        # emitting bf16 in-kernel halves its HBM writes and skips the cast)
        grouped_per_scale = ops.ball_query_group(
            self.radii, self.nsamples, xyz, new_xyz, features, self.use_xyz,
            out_dtype=compute_dtype())
        scale_feats = []
        for grouped, sm in zip(grouped_per_scale, mlp_mods):
            out = sm(grouped, train)  # (B, np, ns, mlp[-1])
            scale_feats.append(jnp.max(out, axis=2))
        return new_xyz, jnp.concatenate(scale_feats, axis=-1)


class PointnetFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + MLP
    (pointnet2_modules.py:148-209)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, unknown: Array, known: Array, unknown_feats: Array | None,
                 known_feats: Array, train: bool) -> Array:
        # one fused kernel on TPU: 3-NN search, inverse-distance weights and
        # the weighted gather never leave VMEM (three_nn + weights +
        # three_interpolate composition elsewhere)
        interp = ops.fp_interpolate(unknown, known, known_feats)  # (B, n, C2)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(self.mlp)(interp, train)


class PointNet2MSG(nn.Module):
    """The reference's 4-stage MSG network (modules.py:244-327): (B, N, 3) -> (B, N, 128).

    ``radii_list`` distinguishes the camera-space extractor
    ([[0.01,0.02],[0.02,0.04],[0.04,0.08],[0.08,0.16]], ist_net.py:16) from the
    world-space enhancer ([[0.05,0.10],...,[0.30,0.40]], ist_net.py:189).
    """

    radii_list: Sequence[Sequence[float]]
    use_xyz: bool = True
    # SA stage sizes are compile-time static (modules.py:250-293 hardcodes them);
    # configurable here for the 2048-pt config and for tiny test graphs.
    npoints: Sequence[int] = (512, 256, 128, 64)

    @nn.compact
    def __call__(self, pointcloud: Array, train: bool) -> Array:
        xyz = pointcloud[..., :3]
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None

        npoints = tuple(self.npoints)
        base = ((16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128, 256))

        l_xyz, l_feats = [xyz], [features]
        for i in range(4):
            mlps = [[c for c in base[i]] for _ in range(2)]
            sa = PointnetSAModuleMSG(
                npoint=npoints[i],
                radii=self.radii_list[i],
                nsamples=(16, 32),
                mlps=mlps,
                use_xyz=self.use_xyz,
            )
            nxyz, nfeat = sa(l_xyz[i], l_feats[i], train)
            l_xyz.append(nxyz)
            l_feats.append(nfeat)

        fp_specs = ([128, 128], [256, 256], [256, 256], [512, 512])
        for i in range(-1, -5, -1):
            l_feats[i - 1] = PointnetFPModule(mlp=fp_specs[i])(
                l_xyz[i - 1], l_xyz[i], l_feats[i - 1], l_feats[i], train)

        return l_feats[0]
