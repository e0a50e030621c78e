"""Model-level tests: shape contracts (SURVEY §2.4), init, train/eval branches.

Tiny configuration (128 pts, 48x48 crop, SA sizes (32,16,8,8)) — the modules
are size-agnostic, and the 1-core CPU test runner can't compile the full
192/1024 graphs quickly. Everything heavy is computed once, jitted, in the
module fixture.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from istnet_tpu.models.ist_net import ISTNet, supervised_loss
from istnet_tpu.nn.rotation import ortho6d_to_mat

TINY_NPOINTS = (32, 16, 8, 8)
B, N, IMG = 2, 128, 48


def _tiny_inputs(train=True):
    rng = np.random.RandomState(0)
    inputs = {
        "rgb": jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32)),
        "pts": jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.1),
        "choose": jnp.asarray(rng.randint(0, IMG * IMG, size=(B, N)).astype(np.int32)),
        "category_label": jnp.asarray(rng.randint(0, 6, size=(B,)).astype(np.int32)),
    }
    if train:
        inputs["qo"] = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.1)
    return inputs


def _labels(inputs):
    return {
        "rotation_label": jnp.tile(jnp.eye(3), (B, 1, 1)),
        "translation_label": jnp.zeros((B, 3)),
        "size_label": jnp.ones((B, 3)),
        "qo": inputs["qo"],
    }


@pytest.fixture(scope="module")
def ctx():
    model = ISTNet(nclass=6, freeze_world_enhancer=False, sa_npoints=TINY_NPOINTS)
    inputs = _tiny_inputs()
    variables = jax.jit(model.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs, train=True)

    @jax.jit
    def train_fwd(variables, inputs):
        return model.apply(variables, inputs, train=True, mutable=["bn_batch"],
                           rngs={"dropout": jax.random.PRNGKey(2)})

    @jax.jit
    def eval_fwd(params, batch_stats, inputs):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           inputs, train=False)

    @jax.jit
    def loss_and_grad(params, batch_stats, inputs, labels):
        def loss_fn(p):
            out, _ = ISTNet(nclass=6, freeze_world_enhancer=False,
                            sa_npoints=TINY_NPOINTS).apply(
                {"params": p, "batch_stats": batch_stats}, inputs, train=True,
                mutable=["bn_batch"], rngs={"dropout": jax.random.PRNGKey(3)})
            total, _ = supervised_loss(out, labels, gamma1=1.0, gamma2=10.0,
                                       freeze_world_enhancer=False)
            return total
        return jax.value_and_grad(loss_fn)(params)

    labels = _labels(inputs)
    train_out, mut = train_fwd(variables, inputs)
    eval_out = eval_fwd(variables["params"], variables["batch_stats"], _tiny_inputs(False))
    loss_val, grads = loss_and_grad(variables["params"], variables["batch_stats"],
                                    inputs, labels)
    return dict(model=model, variables=variables, train_out=train_out, mut=mut,
                eval_out=eval_out, loss=loss_val, grads=grads)


def test_param_count(ctx):
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(ctx["variables"]["params"]))
    # reference logs parameters via gorilla.parameter_count (train.py:121);
    # 3x PointNet2MSG + ResNet18-PSP + heads ≈ 26M.
    assert 20e6 < n < 33e6, f"unexpected parameter count {n}"


def test_train_forward_shapes(ctx):
    out = ctx["train_out"]
    assert out["pred_rotation"].shape == (B, 3, 3)
    assert out["pred_translation"].shape == (B, 3)
    assert out["pred_size"].shape == (B, 3)
    assert out["pred_qo"].shape == (B, N, 3)
    assert out["pts_w_local"].shape == (B, N, 128)
    assert out["pts_w_local_gt"].shape == (B, N, 128)
    assert out["pred_rotation_aux_world"].shape == (B, 3, 3)
    assert "bn_batch" in ctx["mut"]


def test_eval_rotation_validity(ctx):
    r = np.asarray(ctx["eval_out"]["pred_rotation"])
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", r, r),
                               np.tile(np.eye(3), (B, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_loss_finite_and_grads_flow(ctx):
    assert np.isfinite(float(ctx["loss"]))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(ctx["grads"]))
    assert gnorm > 0
    # world-enhancer extractor receives gradient through the feature MSE
    we = ctx["grads"]["world_enhancer"]
    wnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(we))
    assert wnorm > 0


def test_freeze_world_enhancer_param_structure():
    model = ISTNet(nclass=6, freeze_world_enhancer=True, sa_npoints=TINY_NPOINTS)
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                           _tiny_inputs(), train=True))
    we = variables["params"]["world_enhancer"]
    # frozen variant has the extractor but NOT the aux pose head (ist_net.py:189-191)
    assert "extractor" in we and "pose_estimator" not in we


def test_ortho6d_matches_reference_semantics():
    rng = np.random.RandomState(0)
    x_raw = jnp.asarray(rng.randn(8, 3).astype(np.float32))
    y_raw = jnp.asarray(rng.randn(8, 3).astype(np.float32))
    r = np.asarray(ortho6d_to_mat(x_raw, y_raw))
    y = np.asarray(y_raw) / np.linalg.norm(y_raw, axis=-1, keepdims=True)
    np.testing.assert_allclose(r[:, :, 1], y, atol=1e-5)  # col 1 = norm(y_raw)
    np.testing.assert_allclose(np.einsum("bij,bkj->bik", r, r),
                               np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_align_corners_resize_matches_direct_lerp():
    from istnet_tpu.nn.layers import resize_bilinear_align_corners
    rng = np.random.RandomState(0)
    x = rng.rand(2, 5, 7, 3).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 10, 14))
    # direct per-pixel lerp at align-corners positions
    want = np.zeros((2, 10, 14, 3), np.float32)
    ys = np.linspace(0, 4, 10)
    xs = np.linspace(0, 6, 14)
    for i, py in enumerate(ys):
        y0, wy = int(np.floor(py)), py - np.floor(py)
        y1 = min(y0 + 1, 4)
        for j, px in enumerate(xs):
            x0, wx = int(np.floor(px)), px - np.floor(px)
            x1 = min(x0 + 1, 6)
            want[:, i, j] = ((1-wy)*(1-wx)*x[:, y0, x0] + (1-wy)*wx*x[:, y0, x1]
                             + wy*(1-wx)*x[:, y1, x0] + wy*wx*x[:, y1, x1])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sparse_head_equals_dense_gather():
    """sparse_points == gather_by_choose(dense map) exactly in eval mode."""
    from istnet_tpu.models.ist_net import gather_by_choose
    from istnet_tpu.nn.resnet_psp import ModifiedResnet

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, IMG, IMG, 3).astype(np.float32))
    # include border pixels (conv zero-padding) and corners
    special = np.array([0, IMG - 1, IMG * (IMG - 1), IMG * IMG - 1, IMG + 1])
    choose = rng.randint(0, IMG * IMG, (2, 64)).astype(np.int32)
    choose[:, :5] = special
    choose = jnp.asarray(choose)

    m = ModifiedResnet()
    variables = jax.jit(m.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True)
    ev = {"params": variables["params"], "batch_stats": variables["batch_stats"]}

    dense = jax.jit(lambda v, a: gather_by_choose(m.apply(v, a, False), choose))(ev, x)
    sparse = jax.jit(lambda v, a: m.apply(v, a, choose, False,
                                          method=ModifiedResnet.sparse_points))(ev, x)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_dropout2d_channel_semantics():
    """Dropout2d (multiply-mask form): whole channels drop together, kept
    channels scale by 1/keep_p (torch nn.Dropout2d), rate>=1 zeroes instead
    of NaN-ing (0 * inf), eval mode is the identity."""
    from istnet_tpu.nn.layers import Dropout2d

    x = jnp.ones((2, 4, 4, 16), jnp.float32)
    y = np.asarray(Dropout2d(0.5).apply(
        {}, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)}))
    # channel-constant: every spatial position in a (b, c) slice agrees
    assert (y == y[:, :1, :1, :]).all()
    vals = np.unique(y)
    assert set(np.round(vals, 5)) <= {0.0, 2.0}  # dropped or scaled by 1/0.5
    assert 0.0 in vals and 2.0 in vals  # both outcomes occur at rate 0.5

    y1 = np.asarray(Dropout2d(1.0).apply(
        {}, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)}))
    assert (y1 == 0).all() and not np.isnan(y1).any()

    y_eval = np.asarray(Dropout2d(0.5).apply({}, x, train=False))
    np.testing.assert_array_equal(y_eval, np.asarray(x))


def test_modified_resnet_resnet34_backend():
    """The psp_models factory's other BasicBlock entry (reference
    modules.py:225-231; 'resnet18' is the hardcoded default) builds and
    keeps the encoder contract: (B, S, S, 3) -> (B, S, S, 128)."""
    from istnet_tpu.nn.resnet_psp import ModifiedResnet

    m = ModifiedResnet(backend="resnet34")
    x = jnp.zeros((1, 48, 48, 3), jnp.float32)
    variables = jax.jit(m.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True)
    n18 = len(jax.tree_util.tree_leaves(
        jax.jit(ModifiedResnet().init, static_argnames="train")(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=True)["params"]))
    n34 = len(jax.tree_util.tree_leaves(variables["params"]))
    assert n34 > n18  # 16 vs 8 BasicBlocks
    ev = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    out = jax.jit(lambda v, a: m.apply(v, a, train=False))(ev, x)
    assert out.shape == (1, 48, 48, 128)

    import pytest
    with pytest.raises(NotImplementedError):
        ModifiedResnet(backend="resnext9000").init(
            {"params": jax.random.PRNGKey(0)}, x, train=False)


def test_modified_resnet_bottleneck_backend():
    """The Bottleneck psp_models entries (resnet50/101/152, psp_size 2048 —
    reference modules.py:225-231; unreachable there through the hardcoded
    'resnet18' but part of the configured surface). Checks the 1-1-4
    expansion topology (layer-4 at 2048 ch feeding PSP) and the encoder
    contract end to end."""
    from istnet_tpu.nn.resnet_psp import ModifiedResnet, ResNet18Trunk

    x = jnp.zeros((1, 48, 48, 3), jnp.float32)
    trunk = ResNet18Trunk(backend="resnet50")
    tv = jax.jit(trunk.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0)}, x, train=True)
    feat = trunk.apply(
        {"params": tv["params"], "batch_stats": tv["batch_stats"]},
        x, train=False)
    assert feat.shape == (1, 6, 6, 2048)   # stride-8, psp_size 2048
    # 3+4+6+3 Bottlenecks at 3 convs each + stem + 4 downsamples = 53 convs
    flat = jax.tree_util.tree_leaves(tv["params"])
    n_kernels = sum(1 for l in flat if l.ndim == 4)
    assert n_kernels == 16 * 3 + 1 + 4

    m = ModifiedResnet(backend="resnet50")
    variables = jax.jit(m.init, static_argnames="train")(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True)
    ev = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    out = jax.jit(lambda v, a: m.apply(v, a, train=False))(ev, x)
    assert out.shape == (1, 48, 48, 128)
    assert np.isfinite(np.asarray(out)).all()


def test_gather_by_choose_onehot_backward_matches_scatter():
    """The blocked one-hot MXU formulation of the gather_by_choose backward
    (A/B gate ISTNET_ONEHOT_CHOOSE_BWD) computes the same cotangent as the
    AD scatter-add transpose — duplicate indices accumulate, untouched
    pixels stay zero. f32 here, so agreement is exact up to accumulation
    order (tight allclose)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from istnet_tpu.models import ist_net as M

    rng = np.random.RandomState(0)
    b, h, w, c, n = 2, 24, 24, 16, 96
    feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    # force duplicates so the accumulate path is exercised
    choose = jnp.asarray(
        rng.randint(0, h * w, (b, n)).astype(np.int32).reshape(b, n))
    choose = choose.at[:, 1].set(choose[:, 0])
    ct = jnp.asarray(rng.randn(b, n, c).astype(np.float32))

    def run(fn):
        def f(x):
            return jnp.sum(fn(x.reshape(b, h * w, c), choose) * ct)
        return jax.grad(f)(feat.reshape(b, h * w, c))

    g_scatter = run(M._gather_rows)
    g_onehot = run(M._gather_rows_onehot_bwd)
    np.testing.assert_allclose(np.asarray(g_onehot), np.asarray(g_scatter),
                               rtol=1e-6, atol=1e-6)
    # forward values identical
    np.testing.assert_array_equal(
        np.asarray(M._gather_rows(feat.reshape(b, h * w, c), choose)),
        np.asarray(M._gather_rows_onehot_bwd(feat.reshape(b, h * w, c), choose)))


def test_pose_dis_zero_diff_grad_is_zero_like_torch():
    """torch.norm's subgradient at the zero vector is 0 (verified against
    real torch); jnp.linalg.norm's is NaN. pose_dis must use the torch
    convention — a converged run CAN produce exact-zero pose diffs (the
    bf16 convergence test NaN'd at step ~78 before the fix)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from istnet_tpu.models.losses import pose_dis

    r = jnp.tile(jnp.eye(3), (2, 1, 1))
    t = jnp.zeros((2, 3))
    s = jnp.ones((2, 3))

    def f(r1, t1, s1):
        return pose_dis(r1, t1, s1, r, t, s)

    gr, gt, gs = jax.grad(f, argnums=(0, 1, 2))(r, t, s)
    for g in (gr, gt, gs):
        assert np.isfinite(np.asarray(g)).all()
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    # nonzero diffs keep the true gradient
    t1 = t.at[0, 1].set(3.0).at[0, 2].set(4.0)
    g = jax.grad(lambda x: pose_dis(r, x, s, r, t, s))(t1)
    np.testing.assert_allclose(np.asarray(g[0]), [0.0, 0.3, 0.4], atol=1e-6)
