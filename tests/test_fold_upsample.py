"""Folded resize+conv (conv3x3_on_doubled) equals resize -> conv exactly.

PSPUpsample computes ``3x3 conv(pad=1)`` on an align-corners x2-upsampled map
(reference ``model/modules.py:37-48``); the folded form reassociates by
linearity (one low-res matmul + shifted separable interp matrices). These
tests pin the fold against the direct composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from istnet_tpu.nn.layers import (
    TorchConv,
    conv3x3_on_doubled,
    resize_bilinear_align_corners,
)


def _direct(x, k, b):
    up = resize_bilinear_align_corners(x, 2 * x.shape[1], 2 * x.shape[2])
    out = jax.lax.conv_general_dilated(
        up, k, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return out + b


@pytest.mark.parametrize("h,w,cin,cout", [(6, 6, 5, 4), (24, 24, 16, 8),
                                          (5, 9, 3, 7), (1, 4, 2, 3)])
def test_fold_matches_direct_f32(h, w, cin, cout):
    key = jax.random.PRNGKey(h * 100 + w)
    kx, kk, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (2, h, w, cin), jnp.float32)
    k = jax.random.normal(kk, (3, 3, cin, cout), jnp.float32) * 0.1
    b = jax.random.normal(kb, (cout,), jnp.float32)
    want = _direct(x, k, b)
    got = conv3x3_on_doubled(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_torchconv_fold_flag_matches_module_composition():
    """TorchConv(fold_resize2=True) on the small map == resize -> same conv."""
    conv = TorchConv(4, (3, 3), padding=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 8, 6), jnp.float32)
    params = conv.init(jax.random.PRNGKey(1), x)
    up = resize_bilinear_align_corners(x, 16, 16)
    want = conv.apply(params, up)
    got = conv.apply(params, x, fold_resize2=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("b,h,w,cin,cout", [(2, 8, 8, 16, 8), (3, 6, 4, 8, 4)])
def test_pallas_fold_kernel_matches_xla_fold(b, h, w, cin, cout):
    """The eval-only fused Pallas fold (fold_upsample_pallas) equals the XLA
    fold up to f32-accumulation rounding (interpret mode; on TPU the same
    kernel was hardware-checked at up1/up2 shapes, rel diff <= 2e-4)."""
    from istnet_tpu.ops.fold_upsample_pallas import fold_upsample_conv_pallas

    key = jax.random.PRNGKey(b * 10 + w)
    kx, kk, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (b, h, w, cin), jnp.float32)
    k = jax.random.normal(kk, (3, 3, cin, cout), jnp.float32) * 0.1
    bias = jax.random.normal(kb, (cout,), jnp.float32)
    want = conv3x3_on_doubled(x, k, bias)
    got = fold_upsample_conv_pallas(x, k, bias, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_pallas_fold_kernel_epilogue_bit_matches_unfused():
    """The in-kernel BN-eval + PReLU epilogue is BIT-IDENTICAL to applying
    the same ops (in BatchNorm/PReLU's exact op order and dtypes) to the
    epilogue-free kernel output — the fusion must only remove the extra HBM
    pass, never change a ulp. bf16 compute so every intermediate rounding in
    the mirrored chain is exercised."""
    from istnet_tpu.ops.fold_upsample_pallas import fold_upsample_conv_pallas

    b, h, w, cin, cout = 2, 8, 8, 16, 8
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (b, h, w, cin), jnp.bfloat16)
    k = (jax.random.normal(ks[1], (3, 3, cin, cout)) * 0.1).astype(jnp.bfloat16)
    bias = jax.random.normal(ks[2], (cout,), jnp.bfloat16)
    mean = jax.random.normal(ks[3], (cout,), jnp.float32) * 0.5
    var = jax.random.uniform(ks[4], (cout,), jnp.float32, 0.25, 2.0)
    scale = jax.random.normal(ks[5], (cout,), jnp.float32) * 0.8 + 1.0
    bn_bias = jax.random.normal(ks[6], (cout,), jnp.float32) * 0.3
    alpha = jnp.asarray([0.25], jnp.float32)

    plain = fold_upsample_conv_pallas(x, k, bias, True)
    # BatchNorm eval (nn/layers.py) then PReLU, op-for-op
    t = (plain.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
    t = (t * scale + bn_bias).astype(plain.dtype)
    want = jnp.where(t >= 0, t, alpha.astype(t.dtype) * t)

    ep = jnp.stack([mean, jax.lax.rsqrt(var + 1e-5), scale, bn_bias,
                    jnp.broadcast_to(alpha, (cout,))])
    got = fold_upsample_conv_pallas(x, k, bias, True, epilogue=ep)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32))


def test_psp_upsample_fused_epilogue_matches_module(monkeypatch):
    """PSPUpsample's fused eval path (kernel + in-kernel BN/PReLU epilogue,
    forced on via the dispatch gate) matches the unfused module composition
    up to the kernel's documented f32-accumulation rounding — with BN
    stats/affine and the PReLU alpha all randomized so a wrong epilogue row
    would shift the output grossly."""
    from istnet_tpu.nn.resnet_psp import PSPUpsample
    from istnet_tpu.ops import dispatch
    from istnet_tpu.ops.fold_upsample_pallas import fold_upsample_conv_pallas

    monkeypatch.setattr(dispatch, "fold_upsample_kernel_ok",
                        lambda bsz, cin: True)
    monkeypatch.setattr(
        dispatch, "fold_upsample_conv",
        lambda x, k, b, epilogue=None: fold_upsample_conv_pallas(
            x, k, b, True, epilogue=epilogue))

    mod = PSPUpsample(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(1), x, train=True)
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    bn_p = dict(variables["params"]["BatchNorm_0"])
    bn_s = dict(variables["batch_stats"]["BatchNorm_0"])
    bn_s["mean"] = jax.random.normal(ks[0], (8,), jnp.float32)
    bn_s["var"] = jax.random.uniform(ks[1], (8,), jnp.float32, 0.5, 1.5)
    bn_p["scale"] = jax.random.normal(ks[2], (8,), jnp.float32) + 1.0
    bn_p["bias"] = jax.random.normal(ks[3], (8,), jnp.float32) * 0.2
    variables = {
        "params": {**variables["params"], "BatchNorm_0": bn_p,
                   "PReLU_0": {"alpha": jnp.asarray([0.4], jnp.float32)}},
        "batch_stats": {**variables["batch_stats"], "BatchNorm_0": bn_s},
    }

    got = mod.apply(variables, x, train=False)  # fused path (gate forced)
    monkeypatch.setattr(dispatch, "fold_upsample_kernel_ok",
                        lambda bsz, cin: False)
    want = mod.apply(variables, x, train=False)  # unfused module path
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_torchconv_param_tree_unchanged():
    """Param paths/shapes must stay nn.Conv-compatible for checkpoints and
    the torch weight converter (Conv_0/kernel, Conv_0/bias)."""
    conv = TorchConv(4, (3, 3), padding=1)
    params = conv.init(jax.random.PRNGKey(1),
                       jnp.zeros((1, 8, 8, 6), jnp.float32))
    leaves = params["params"]["Conv_0"]
    assert set(leaves) == {"kernel", "bias"}
    assert leaves["kernel"].shape == (3, 3, 6, 4)
    assert leaves["bias"].shape == (4,)


def test_torchconv_matches_nn_conv_lowering():
    """The lax.conv reimplementation matches flax nn.Conv for the same params
    (stride/dilation/padding overrides included)."""
    import flax.linen as nn

    conv = TorchConv(5, (3, 3), strides=(2, 2), padding=2, dilation=2)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 12, 3), jnp.float32)
    params = conv.init(jax.random.PRNGKey(3), x)
    got = conv.apply(params, x)
    ref = nn.Conv(5, (3, 3), strides=(2, 2), padding=[(2, 2), (2, 2)],
                  kernel_dilation=(2, 2)).apply(
        {"params": params["params"]["Conv_0"]}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # call-time padding override (sparse point-decode path)
    got0 = conv.apply(params, x, padding=0)
    ref0 = nn.Conv(5, (3, 3), strides=(2, 2), padding=[(0, 0), (0, 0)],
                   kernel_dilation=(2, 2)).apply(
        {"params": params["params"]["Conv_0"]}, x)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(ref0),
                               rtol=1e-6, atol=1e-6)
