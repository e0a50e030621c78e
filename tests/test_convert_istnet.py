"""Full-model torch->flax checkpoint conversion: coverage + numeric parity.

Two layers of proof for ``cli/convert_torch_istnet.py``:

1. Manifest coverage: every key of the reference's ``state_dict`` (fixture
   ``tests/data/ref_torch_keys.json``, extracted from an instantiated
   reference model) must map onto exactly the flax variable tree our models
   create (fixture ``tests/data/flax_tree_manifest.json``), shape-for-shape,
   with no leftovers in either direction.

2. Numeric parity against REAL torch forwards for every pure-torch submodule
   family (encoder, heavy/light estimators, feature deformer): a randomized
   reference module's output must match our flax module's output under the
   converted weights. (The pointnet extractors can't run in torch here — their
   CUDA ops aren't built — but their SharedMLP conversion convention is the
   same Conv2d-1x1/BN mapping the encoder tests pin, and the op semantics are
   covered by the golden kernel tests.)

The parity tests import modules from ``/root/reference`` (read-only) and are
skipped when the reference checkout is absent.
"""

import json
import os
import sys
import types

import numpy as np
import pytest

from istnet_tpu.cli import convert_torch_istnet as C

DATA = os.path.join(os.path.dirname(__file__), "data")
REF = "/root/reference"

with open(os.path.join(DATA, "ref_torch_keys.json")) as f:
    TORCH_MANIFEST = json.load(f)
with open(os.path.join(DATA, "flax_tree_manifest.json")) as f:
    FLAX_MANIFEST = json.load(f)


def _random_sd(model: str, seed: int = 0) -> dict:
    rng = np.random.RandomState(seed)
    sd = {}
    for k, shape in TORCH_MANIFEST[model].items():
        if k.endswith("num_batches_tracked"):
            sd[k] = np.asarray(0, np.int64)
        elif k.endswith("running_var"):
            sd[k] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        else:
            sd[k] = rng.randn(*shape).astype(np.float32) * 0.1
    return sd


# ---------------------------------------------------------------------------
# 1. manifest coverage
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("model", ["ist_net", "posenet_gt"])
def test_conversion_covers_exact_flax_tree(model):
    trees = C.convert_state_dict(_random_sd(model), model)
    for coll in ("params", "batch_stats"):
        got = {p: list(v.shape) for p, v in C._flatten(trees[coll]).items()}
        exp = FLAX_MANIFEST[model][coll]
        assert got == exp, (
            f"missing={sorted(set(exp) - set(got))[:5]} "
            f"extra={sorted(set(got) - set(exp))[:5]}")


def test_freeze_checkpoint_without_pose_estimator():
    """freeze_world_enhancer checkpoints ship no world pose head
    (reference train.py:103-118); conversion must succeed without it."""
    sd = {k: v for k, v in _random_sd("ist_net").items()
          if not k.startswith("world_enhancer.pose_estimator.")}
    trees = C.convert_state_dict(sd, "ist_net")
    assert "pose_estimator" not in trees["params"]["world_enhancer"]
    assert "extractor" in trees["params"]["world_enhancer"]


def test_missing_key_raises():
    sd = _random_sd("ist_net")
    del sd["main_estimator.pose_mlp2.0.weight"]
    with pytest.raises(C.ConversionError, match="missing torch key"):
        C.convert_state_dict(sd, "ist_net")


def test_unmapped_key_raises():
    sd = _random_sd("ist_net")
    sd["mystery.layer.weight"] = np.zeros((3,), np.float32)
    with pytest.raises(C.ConversionError, match="not mapped"):
        C.convert_state_dict(sd, "ist_net")


def test_npz_roundtrip(tmp_path):
    trees = C.convert_state_dict(_random_sd("posenet_gt", seed=3), "posenet_gt")
    path = str(tmp_path / "conv.npz")
    C.save_npz(trees, path)
    back = C.load_npz(path)
    flat_a, flat_b = C._flatten(trees["params"]), C._flatten(back["params"])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_world_enhancer_transplant_from_torch(tmp_path):
    """A converted PoseNetGT checkpoint feeds the two-phase transplant like a
    native phase-1 checkpoint (reference train.py:103-118)."""
    from istnet_tpu.train.checkpoints import load_world_enhancer

    trees = C.convert_state_dict(_random_sd("posenet_gt", seed=9), "posenet_gt")
    path = str(tmp_path / "posenet_gt.npz")
    C.save_npz(trees, path)
    params = {"world_enhancer": {"extractor": None}, "other": {"x": np.zeros(2)}}
    stats = {"world_enhancer": {"extractor": None}}
    new_p, new_s = load_world_enhancer(path, 0, params, stats)
    got = C._flatten(new_p["world_enhancer"]["extractor"])
    exp = C._flatten(trees["params"]["pts_gt_extractor"])
    assert set(got) == set(exp)
    for k in exp:
        np.testing.assert_array_equal(got[k], exp[k])
    assert set(C._flatten(new_s["world_enhancer"]["extractor"])) == set(
        C._flatten(trees["batch_stats"]["pts_gt_extractor"]))


def test_converted_full_model_runs_eval_forward():
    """The converted tree must load into the real ISTNet and produce finite
    eval outputs (catches any structural drift the manifests could miss)."""
    import jax.numpy as jnp

    from istnet_tpu.models.ist_net import ISTNet

    trees = C.convert_state_dict(_random_sd("ist_net", seed=7), "ist_net")
    b, n, img = 1, 32, 96
    rng = np.random.RandomState(5)
    inputs = {
        "rgb": jnp.asarray(rng.randn(b, img, img, 3), jnp.float32),
        "pts": jnp.asarray(rng.randn(b, n, 3) * 0.1, jnp.float32),
        "choose": jnp.asarray(rng.randint(0, img * img, (b, n)), jnp.int32),
        "category_label": jnp.asarray([3], jnp.int32),
    }
    out = ISTNet(sa_npoints=(16, 8, 8, 8)).apply(
        {"params": trees["params"], "batch_stats": trees["batch_stats"]},
        inputs, train=False)
    for key in ("pred_rotation", "pred_translation", "pred_size", "pred_qo"):
        assert np.all(np.isfinite(np.asarray(out[key]))), key


# ---------------------------------------------------------------------------
# 2. numeric parity vs real torch forwards
# ---------------------------------------------------------------------------

needs_reference = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref():
    """Import the reference's pure-torch modules (CUDA ext stubbed out —
    none of the modules under test call it)."""
    for p in (REF, os.path.join(REF, "model"), os.path.join(REF, "utils"),
              os.path.join(REF, "model", "pointnet2")):
        if p not in sys.path:
            sys.path.insert(0, p)
    if "pointnet2._ext" not in sys.modules:
        sys.modules["pointnet2._ext"] = types.ModuleType("pointnet2._ext")
        pkg = types.ModuleType("pointnet2")
        pkg.__path__ = [os.path.join(REF, "model", "pointnet2")]
        sys.modules["pointnet2"] = pkg
    import torch
    # the reference's normalize_vector hard-codes .cuda()
    # (utils/rotation_utils.py:6); torch is CPU-only here
    torch.Tensor.cuda = lambda self, *a, **k: self
    import modules as ref_modules  # noqa: F401  (reference model/modules.py)
    import ist_net as ref_ist_net  # noqa: F401  (reference model/ist_net.py)
    return types.SimpleNamespace(modules=ref_modules, ist_net=ref_ist_net)


def _randomize(torch, module, seed):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
        for name, b in module.named_buffers():
            if name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=gen) + 0.5)
            elif name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=gen) * 0.1)


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@needs_reference
def test_heavy_estimator_parity(ref):
    import torch

    from istnet_tpu.nn.estimators import HeavyEstimator

    m = ref.ist_net.HeavyEstimator()
    _randomize(torch, m, 11)
    m.eval()
    b, n = 2, 64
    rng = np.random.RandomState(1)
    pts = rng.randn(b, n, 3).astype(np.float32)
    pts_w = rng.randn(b, n, 3).astype(np.float32)
    rgb_local = rng.randn(b, 128, n).astype(np.float32)
    pts_local = rng.randn(b, 128, n).astype(np.float32)
    pts_w_local = rng.randn(b, 128, n).astype(np.float32)

    with torch.no_grad():
        r_t, t_t, s_t = m(torch.from_numpy(pts), torch.from_numpy(pts_w),
                          torch.from_numpy(rgb_local), torch.from_numpy(pts_local),
                          torch.from_numpy(pts_w_local))

    sd = C._SD({"est." + k: v for k, v in _np_sd(m).items()})
    params = C._heavy_estimator(sd, "est")
    assert not sd.leftovers()
    r_j, t_j, s_j = HeavyEstimator().apply(
        {"params": params}, pts, pts_w,
        np.transpose(rgb_local, (0, 2, 1)), np.transpose(pts_local, (0, 2, 1)),
        np.transpose(pts_w_local, (0, 2, 1)))
    np.testing.assert_allclose(np.asarray(r_j), r_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(t_j), t_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_j), s_t.numpy(), atol=2e-5)


@needs_reference
def test_light_estimator_parity(ref):
    import torch

    from istnet_tpu.nn.estimators import LightEstimator

    m = ref.ist_net.LightEstimator()
    _randomize(torch, m, 12)
    m.eval()
    b, n = 2, 64
    rng = np.random.RandomState(2)
    pts = rng.randn(b, n, 3).astype(np.float32)
    rgb_local = rng.randn(b, 128, n).astype(np.float32)
    pts_local = rng.randn(b, 128, n).astype(np.float32)
    with torch.no_grad():
        r_t, t_t, s_t = m(torch.from_numpy(pts), torch.from_numpy(rgb_local),
                          torch.from_numpy(pts_local))
    sd = C._SD({"est." + k: v for k, v in _np_sd(m).items()})
    params = C._light_estimator(sd, "est")
    assert not sd.leftovers()
    r_j, t_j, s_j = LightEstimator().apply(
        {"params": params}, pts,
        np.transpose(rgb_local, (0, 2, 1)), np.transpose(pts_local, (0, 2, 1)))
    np.testing.assert_allclose(np.asarray(r_j), r_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(t_j), t_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_j), s_t.numpy(), atol=2e-5)


@needs_reference
def test_feature_deformer_parity(ref):
    import torch

    from istnet_tpu.nn.estimators import ImplicitTransformation

    m = ref.ist_net.ImplicitTransformation(nclass=6)
    _randomize(torch, m, 13)
    m.eval()
    b, n = 2, 64
    rng = np.random.RandomState(3)
    pts = rng.randn(b, n, 3).astype(np.float32)
    rgb_local = rng.randn(b, 128, n).astype(np.float32)
    pts_local = rng.randn(b, 128, n).astype(np.float32)
    cls = np.array([2, 5], np.int64)
    # the reference caller's flat class index (ist_net.py:47-52):
    index = torch.from_numpy((cls + np.arange(b) * 6).astype(np.int64))
    with torch.no_grad():
        pts_w_t, pts_local_w_t = m(torch.from_numpy(rgb_local),
                                   torch.from_numpy(pts_local),
                                   torch.from_numpy(pts), None, index)
    sd = C._SD({"it." + k: v for k, v in _np_sd(m).items()})
    params = C._deformer(sd, "it")
    assert not sd.leftovers()
    pts_w_j, pts_local_w_j = ImplicitTransformation(nclass=6).apply(
        {"params": params},
        np.transpose(rgb_local, (0, 2, 1)), np.transpose(pts_local, (0, 2, 1)),
        pts, cls.astype(np.int32))
    np.testing.assert_allclose(np.asarray(pts_w_j), pts_w_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pts_local_w_j),
                               np.transpose(pts_local_w_t.numpy(), (0, 2, 1)),
                               atol=2e-5)


@needs_reference
def test_encoder_parity(ref):
    """Modified_PSPNet forward vs our ModifiedResnet under converted weights.

    96x96 input (PSP grid 12 divides 1/2/3/6 like the production 24) keeps the
    single-core CPU run fast while exercising trunk, PSP, upsamples, PReLUs,
    and all BN running stats.
    """
    import torch

    from istnet_tpu.nn.resnet_psp import ModifiedResnet

    m = ref.modules.Modified_PSPNet(sizes=(1, 2, 3, 6), psp_size=512,
                                    backend="resnet18", pretrained=False)
    _randomize(torch, m, 14)
    m.eval()
    rng = np.random.RandomState(4)
    x = rng.randn(1, 3, 96, 96).astype(np.float32)
    with torch.no_grad():
        y_t = m(torch.from_numpy(x)).numpy()  # (B, 128, 96, 96)

    np_sd = {"enc.model." + k: v.detach().numpy() for k, v in m.state_dict().items()}
    sd = C._SD(np_sd)
    params, stats = C._encoder(sd, "enc")
    sd.drop_matching(r"num_batches_tracked$")
    assert not sd.leftovers()

    y_j = ModifiedResnet().apply(
        {"params": params, "batch_stats": stats},
        np.transpose(x, (0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(y_j), (0, 3, 1, 2)),
                               y_t, atol=5e-4)


# ---------------------------------------------------------------------------
# 2b. full-model forward parity: reference IST_Net vs our ISTNet
# ---------------------------------------------------------------------------

def _install_ext_stubs(torch):
    """Populate the ``pointnet2._ext`` stub module with numpy implementations
    of the six CUDA kernels, so the reference ``IST_Net.forward`` runs whole
    on CPU. Semantics transcribed from ``_ext_src/src/*.cu`` exactly like
    ``istnet_tpu/ops/golden.py`` (the slow goldens), but vectorized — the
    triple-loop golden ball query would take minutes at n=1024."""
    import sys

    ext = sys.modules["pointnet2._ext"]

    # Precision convention, mirroring istnet_tpu/ops/pointnet2.py's pinned
    # CUDA semantics: ALL index decisions (fps, ball query, 3-nn) and the
    # interpolation arithmetic run in FLOAT32 regardless of input dtype —
    # our XLA ops deliberately cast these to f32. Feature gathers/scatters
    # follow the input dtype, so the f64 gradient-parity test keeps the
    # dense chains double while both sides agree BIT-EXACTLY on indices.

    def _d2(a, b):  # (m,3),(n,3) -> (m,n) f32 squared distances
        a32, b32 = a.astype(np.float32), b.astype(np.float32)
        return np.sum((a32[:, None, :] - b32[None, :, :]) ** 2,
                      axis=-1).astype(np.float32)

    def furthest_point_sampling(xyz, npoint):
        from istnet_tpu.ops.golden import fps_golden
        return torch.from_numpy(
            fps_golden(xyz.numpy().astype(np.float32), npoint))

    def gather_points(features, idx):  # (B,C,N), (B,np) -> (B,C,np)
        f, i = features.numpy(), idx.numpy()
        out = np.take_along_axis(f, i[:, None, :].astype(np.int64), axis=2)
        return torch.from_numpy(np.ascontiguousarray(out))

    def ball_query(new_xyz, xyz, radius, nsample):
        # ball_query_gpu.cu:14-59 — first nsample in-radius hits in ascending
        # point order, pad with the first hit (zeros when no hit).
        nx, x = new_xyz.numpy(), xyz.numpy()
        b, m, _ = nx.shape
        out = np.zeros((b, m, nsample), np.int32)
        for bi in range(b):
            hit = _d2(nx[bi], x[bi]) < np.float32(radius) ** 2  # (m, n)
            order = np.argsort(~hit, kind="stable", axis=-1)     # hits first
            cnt = hit.sum(-1, keepdims=True)                     # (m, 1)
            first = np.where(cnt > 0, order[:, :1], 0)
            sl = order[:, :nsample]
            out[bi] = np.where(np.arange(nsample)[None] < cnt, sl, first)
        return torch.from_numpy(out)

    def group_points(features, idx):  # (B,C,N), (B,np,ns) -> (B,C,np,ns)
        f, i = features.numpy(), idx.numpy().astype(np.int64)
        b, c, _ = f.shape
        out = np.take_along_axis(f[:, :, None, :],
                                 i[:, None, :, :], axis=3)
        return torch.from_numpy(np.ascontiguousarray(out))

    def three_nn(unknown, known):
        # interpolate_gpu.cu:14-73 — returns SQUARED dists (the python
        # wrapper sqrts, pointnet2_utils.py:142); first-occurrence ties.
        # Direct-form d2 in the INPUT dtype (unlike fps/ball-query, the
        # distances here are VALUES — they become interpolation weights —
        # so the f64 parity run needs them double; our three_nn mirrors
        # this with a direct-form f64 branch).
        u, k = unknown.numpy(), known.numpy()
        b, n, _ = u.shape
        dist2 = np.zeros((b, n, 3), u.dtype)
        idx = np.zeros((b, n, 3), np.int32)
        for bi in range(b):
            d2 = np.sum((u[bi][:, None, :] - k[bi][None, :, :]) ** 2, axis=-1)
            order = np.argsort(d2, kind="stable", axis=-1)[:, :3]
            idx[bi] = order
            dist2[bi] = np.take_along_axis(d2, order, axis=-1)
        return torch.from_numpy(dist2), torch.from_numpy(idx)

    def three_interpolate(features, idx, weight):  # (B,c,m),(B,n,3),(B,n,3)
        f, i, w = features.numpy(), idx.numpy().astype(np.int64), weight.numpy()
        g = np.take_along_axis(f[:, :, None, :], i[:, None, :, :], axis=3)
        out = np.sum(g * w[:, None, :, :], axis=-1, dtype=f.dtype)
        return torch.from_numpy(np.ascontiguousarray(out))

    # backward kernels (the reference's autograd.Functions call these from
    # their .backward, pointnet2_utils.py:113/199/252): f32 scatter-adds,
    # semantics of _ext_src/src/{sampling,group_points,interpolate}_gpu.cu
    def gather_points_grad(grad_out, idx, n):  # (B,C,np), (B,np) -> (B,C,N)
        g, i = grad_out.numpy(), idx.numpy().astype(np.int64)
        b, c, npnt = g.shape
        out = np.zeros((b, c, n), g.dtype)
        for bi in range(b):
            np.add.at(out[bi].T, i[bi], g[bi].T)
        return torch.from_numpy(out)

    def group_points_grad(grad_out, idx, n):  # (B,C,np,ns),(B,np,ns)->(B,C,N)
        g, i = grad_out.numpy(), idx.numpy().astype(np.int64)
        b, c = g.shape[:2]
        out = np.zeros((b, c, n), g.dtype)
        for bi in range(b):
            np.add.at(out[bi].T, i[bi].reshape(-1),
                      g[bi].reshape(c, -1).T)
        return torch.from_numpy(out)

    def three_interpolate_grad(grad_out, idx, weight, m):
        # (B,c,n), (B,n,3), (B,n,3) -> (B,c,m)
        g = grad_out.numpy()
        i = idx.numpy().astype(np.int64)
        w = weight.numpy()
        b, c, _ = g.shape
        out = np.zeros((b, c, m), g.dtype)
        for bi in range(b):
            contrib = g[bi].T[:, None, :] * w[bi][:, :, None]  # (n, 3, c)
            np.add.at(out[bi].T, i[bi].reshape(-1), contrib.reshape(-1, c))
        return torch.from_numpy(out)

    ext.furthest_point_sampling = furthest_point_sampling
    ext.gather_points = gather_points
    ext.ball_query = ball_query
    ext.group_points = group_points
    ext.three_nn = three_nn
    ext.three_interpolate = three_interpolate
    ext.gather_points_grad = gather_points_grad
    ext.group_points_grad = group_points_grad
    ext.three_interpolate_grad = three_interpolate_grad


@needs_reference
@pytest.mark.slow
@pytest.mark.parametrize("train", [False, True], ids=["eval", "train"])
def test_full_model_forward_parity(ref, monkeypatch, train):
    """THE end-to-end accuracy-parity statement available without NOCS data:
    the reference ``IST_Net.forward`` (ist_net.py:22-76) run whole on CPU
    (CUDA ops replaced by numpy transcriptions of the .cu kernels) and our
    ``ISTNet`` under the converted weights are the same function, on both the
    eval and train branches, plus the training loss (ist_net.py:78-111).

    Dropout is disabled on BOTH sides (torch Dropout2d -> eval, flax
    Dropout2d -> identity): it carries no golden-value contract and the two
    RNGs cannot be aligned. BatchNorm runs in true batch-stats mode on the
    train branch and running-stats mode on the eval branch, both sides."""
    import torch

    import jax.numpy as jnp

    from istnet_tpu.models.ist_net import ISTNet, supervised_loss
    from istnet_tpu.nn import layers

    _install_ext_stubs(torch)

    # IST_Net's encoder hard-codes pretrained=True (modules.py:237 ->
    # resnet.py:205-210 model_zoo download); no egress here and the weights
    # are _randomize'd right after anyway — skip the download.
    resnet_mod = sys.modules["resnet"]
    monkeypatch.setattr(resnet_mod, "resnet18",
                        lambda pretrained=False: resnet_mod.ResNet(
                            resnet_mod.BasicBlock, [2, 2, 2, 2]))
    m = ref.ist_net.IST_Net()
    _randomize(torch, m, 31)
    if train:
        m.train()
        for mod in m.modules():
            if isinstance(mod, torch.nn.Dropout2d):
                mod.eval()
    else:
        m.eval()

    # img=96 (not smaller): the reference trunk's dead not-fully_conv tail
    # (resnet.py:197-198 x.view) crashes on the non-contiguous layer4 output
    # below 96; 96 keeps the PSP grid (12) divisible by 1/2/3/6 like
    # production 24.
    b, n, img = 2, 1024, 96
    rng = np.random.RandomState(6)
    rgb = rng.randn(b, img, img, 3).astype(np.float32)
    pts = (rng.randn(b, n, 3) * 0.1).astype(np.float32)
    choose = rng.randint(0, img * img, (b, n)).astype(np.int64)
    cls = np.array([1, 4], np.int64)
    qo = (rng.rand(b, n, 3).astype(np.float32) - 0.5) * 0.4

    t_inputs = {
        # ascontiguousarray: a strided NCHW view would flip torch convs into
        # channels_last and crash the trunk's dead x.view tail (resnet.py:198)
        "rgb": torch.from_numpy(np.ascontiguousarray(np.transpose(rgb, (0, 3, 1, 2)))),
        "pts": torch.from_numpy(pts),
        "choose": torch.from_numpy(choose),
        "category_label": torch.from_numpy(cls),
        "qo": torch.from_numpy(qo),
    }
    with torch.no_grad():
        t_out = m(t_inputs)

    trees = C.convert_state_dict(_np_sd(m), "ist_net")
    # identity dropout on the flax side too (train branch only path that has
    # dropout is the encoder; eval never calls it)
    monkeypatch.setattr(layers.Dropout2d, "__call__",
                        lambda self, x, train: x)
    j_inputs = {
        "rgb": jnp.asarray(rgb),
        "pts": jnp.asarray(pts),
        "choose": jnp.asarray(choose, jnp.int32),
        "category_label": jnp.asarray(cls, jnp.int32),
    }
    if train:
        j_inputs["qo"] = jnp.asarray(qo)
    variables = {"params": trees["params"], "batch_stats": trees["batch_stats"]}
    if train:
        j_out, _ = ISTNet().apply(variables, j_inputs, train=True,
                                  mutable=["batch_stats"])
    else:
        j_out = ISTNet().apply(variables, j_inputs, train=False)

    keys = ["pred_rotation", "pred_translation", "pred_size", "pred_qo"]
    if train:
        keys += ["pts_w_local", "pts_w_local_gt",
                 "pred_rotation_aux_cam", "pred_translation_aux_cam",
                 "pred_size_aux_cam", "pred_rotation_aux_world",
                 "pred_translation_aux_world", "pred_size_aux_world"]
    assert set(j_out) == set(t_out)
    for k in keys:
        t_v = t_out[k].numpy()
        j_v = np.asarray(j_out[k])
        if k in ("pts_w_local", "pts_w_local_gt"):
            j_v = np.transpose(j_v, (0, 2, 1))  # ours is channel-last
        # train runs every BN in batch-stats mode: dividing by the batch std
        # of random-weight activations amplifies f32 drift a few x vs eval
        # (measured: eval max |diff| < 2e-3; train 4.9e-3 on 3/6144 pred_qo
        # elements, everything else inside 2e-3)
        atol = 8e-3 if train else 2e-3
        np.testing.assert_allclose(j_v, t_v, atol=atol, rtol=1e-3, err_msg=k)

    if train:
        labels = {
            "rotation_label": rng.randn(b, 3, 3).astype(np.float32),
            "translation_label": rng.randn(b, 3).astype(np.float32) * 0.1,
            "size_label": rng.rand(b, 3).astype(np.float32),
            "qo": qo,
        }
        t_ep = dict(t_out)
        for k, v in labels.items():
            t_ep[k] = torch.from_numpy(v)
        cfg = types.SimpleNamespace(
            loss=types.SimpleNamespace(gamma1=8.0, gamma2=10.0),
            freeze_world_enhancer=False)
        with torch.no_grad():
            t_loss = float(ref.ist_net.SupervisedLoss(cfg)(t_ep))
        j_loss, _ = supervised_loss(
            j_out, {k: jnp.asarray(v) for k, v in labels.items()},
            gamma1=8.0, gamma2=10.0, freeze_world_enhancer=False)
        np.testing.assert_allclose(float(j_loss), t_loss, rtol=2e-4)


@pytest.mark.slow
@needs_reference
def test_full_model_gradient_parity(ref, monkeypatch):
    """The training objective has the same GRADIENTS: d loss / d {pts, rgb,
    qo} through the ENTIRE reference network (torch autograd over the numpy
    _ext stubs — the reference's own Function.backward wrappers call the
    *_grad kernels) must match jax.grad through ours under converted
    weights. Input grads exercise every layer's backward chain, including
    the scatter-add semantics of gather/group/interpolate
    (_ext_src/src/*_gpu.cu) and the custom VJPs of the fused kernels.

    Run in FLOAT64 on both sides: at f32, ~1e-4 forward drift flips
    subgradient routing at max/relu ties (both routings are valid
    subgradients — ball-query pad slots guarantee exact ties), which made
    an elementwise f32 comparison ill-posed (15% structured disagreement).
    At f64, index decisions stay bit-identical (both sides pin them to f32
    — CUDA semantics), the dense chains run double, residual drift comes
    only from the deliberately-f32 interpolation islands (~1e-6).
    This hunt also caught a REAL bug: the XLA fp_interpolate fallback
    differentiated through sqrt(dist) at exact-zero distances -> NaN
    d loss/d pts (fixed with stop_gradient, matching the reference's
    non-diff ThreeNN)."""
    import torch

    import jax

    from istnet_tpu.nn import layers, precision

    _install_ext_stubs(torch)
    resnet_mod = sys.modules["resnet"]
    monkeypatch.setattr(resnet_mod, "resnet18",
                        lambda pretrained=False: resnet_mod.ResNet(
                            resnet_mod.BasicBlock, [2, 2, 2, 2]))
    monkeypatch.setattr(layers.Dropout2d, "__call__",
                        lambda self, x, train: x)

    m = ref.ist_net.IST_Net()
    _randomize(torch, m, 41)
    m.double().train()
    for mod in m.modules():
        if isinstance(mod, torch.nn.Dropout2d):
            mod.eval()

    b, n, img = 2, 1024, 96
    rng = np.random.RandomState(8)
    rgb = rng.randn(b, img, img, 3)
    pts = rng.randn(b, n, 3) * 0.1
    choose = rng.randint(0, img * img, (b, n)).astype(np.int64)
    cls = np.array([0, 3], np.int64)
    qo = (rng.rand(b, n, 3) - 0.5) * 0.4
    labels_np = {
        "rotation_label": rng.randn(b, 3, 3),
        "translation_label": rng.randn(b, 3) * 0.1,
        "size_label": rng.rand(b, 3),
        "qo": qo,
    }

    # ---- torch side (double)
    t_rgb = torch.from_numpy(
        np.ascontiguousarray(np.transpose(rgb, (0, 3, 1, 2)))).requires_grad_()
    t_pts = torch.from_numpy(pts.copy()).requires_grad_()
    t_qo = torch.from_numpy(qo.copy()).requires_grad_()
    t_inputs = {"rgb": t_rgb, "pts": t_pts, "choose": torch.from_numpy(choose),
                "category_label": torch.from_numpy(cls), "qo": t_qo}
    t_out = m(t_inputs)
    for k, v in labels_np.items():
        t_out[k] = torch.from_numpy(v)
    cfg = types.SimpleNamespace(
        loss=types.SimpleNamespace(gamma1=8.0, gamma2=10.0),
        freeze_world_enhancer=False)
    t_loss = ref.ist_net.SupervisedLoss(cfg)(t_out)
    t_loss.backward()
    t_g = {"pts": t_pts.grad.numpy(),
           "rgb": np.transpose(t_rgb.grad.numpy(), (0, 2, 3, 1)),
           "qo": t_qo.grad.numpy()}

    # ---- flax side (x64, converted weights cast to f64)
    trees = C.convert_state_dict(
        {k: v.detach().numpy().astype(np.float32)
         for k, v in m.state_dict().items()}, "ist_net")
    jax.config.update("jax_enable_x64", True)
    precision.set_compute_dtype(np.float64)
    try:
        import jax.numpy as jnp

        from istnet_tpu.models.ist_net import ISTNet, supervised_loss

        to64 = lambda t: jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), t)
        variables = {"params": to64(trees["params"]),
                     "batch_stats": to64(trees["batch_stats"])}
        labels_j = {k: jnp.asarray(v, jnp.float64) for k, v in labels_np.items()}

        def loss_fn(j_pts, j_rgb, j_qo):
            inputs = {"rgb": j_rgb, "pts": j_pts, "qo": j_qo,
                      "choose": jnp.asarray(choose, jnp.int32),
                      "category_label": jnp.asarray(cls, jnp.int32)}
            out, _ = ISTNet().apply(variables, inputs, train=True,
                                    mutable=["batch_stats"])
            total, _ = supervised_loss(out, labels_j, gamma1=8.0, gamma2=10.0,
                                       freeze_world_enhancer=False)
            return total

        j_loss, j_grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
            jnp.asarray(pts, jnp.float64), jnp.asarray(rgb, jnp.float64),
            jnp.asarray(qo, jnp.float64))
        j_g = {"pts": np.asarray(j_grads[0]), "rgb": np.asarray(j_grads[1]),
               "qo": np.asarray(j_grads[2])}
    finally:
        jax.config.update("jax_enable_x64", False)
        precision.set_compute_dtype(np.float32)

    np.testing.assert_allclose(float(j_loss), float(t_loss.detach()), rtol=1e-5)
    for k in ("pts", "rgb", "qo"):
        # normalize by the grad scale: the comparison is about the chain,
        # not the (huge) dynamic range across individual elements
        scale = np.abs(t_g[k]).max() + 1e-300
        np.testing.assert_allclose(j_g[k] / scale, t_g[k] / scale,
                                   atol=1e-5, err_msg=f"grad {k}")


@needs_reference
@pytest.mark.slow
@pytest.mark.parametrize("freeze", [False, True], ids=["unfrozen", "frozen"])
def test_optimizer_trajectory_parity(ref, monkeypatch, freeze):
    """The last unproven link to training parity (VERDICT r3 item 2): N real
    update steps of the COMPOSED training recurrence track torch's, in f64.

    Torch side reproduces the reference's actual recurrence exactly
    (utils/solver.py:40-49, 85-122): Adam with TORCH DEFAULTS — the reference
    never passes its config betas/eps — over requires_grad params, torch
    ``CyclicLR.step(iter)`` called BEFORE each update, ``BNMomentumScheduler``
    re-setting every BN's momentum from the iteration count, SupervisedLoss
    per config. Ours is ``make_train_step`` + ``make_optimizer`` + the
    scheduled BN-EMA. Small step_size_up / decay_step make the LR and BN
    momentum actually MOVE across the 4 steps, so any off-by-one in either
    schedule composition shifts the trajectory. Both the default and the
    frozen-world-enhancer recipes are driven (the frozen one adds the optax
    multi_transform masking vs torch's requires_grad filtering).

    Checked: per-step losses, final params, and final BN running stats
    (unbiased-var EMA under the scheduled momentum), compared through
    ``export_state_dict`` key-by-key."""
    import torch

    import jax

    from istnet_tpu.nn import layers, precision

    _install_ext_stubs(torch)
    resnet_mod = sys.modules["resnet"]
    monkeypatch.setattr(resnet_mod, "resnet18",
                        lambda pretrained=False: resnet_mod.ResNet(
                            resnet_mod.BasicBlock, [2, 2, 2, 2]))
    monkeypatch.setattr(layers.Dropout2d, "__call__",
                        lambda self, x, train: x)

    steps, b, n, img = 4, 2, 1024, 96
    max_epoch, iters_per_epoch = 3, 12          # step_size_up = 6: lr moves
    bn_cfg = dict(bn_momentum=0.9, bn_decay=0.5, decay_step=2, bnm_clip=0.01)
    gamma1, gamma2 = 8.0, (100.0 if freeze else 10.0)  # freeze yaml: gamma2=100

    def make_data(k):
        rng = np.random.RandomState(100 + k)
        inputs = {
            "rgb": rng.randn(b, img, img, 3),
            "pts": rng.randn(b, n, 3) * 0.1,
            "choose": rng.randint(0, img * img, (b, n)).astype(np.int64),
            "category_label": np.array([k % 6, (k + 3) % 6], np.int64),
            "qo": (rng.rand(b, n, 3) - 0.5) * 0.4,
        }
        labels = {
            "rotation_label": rng.randn(b, 3, 3),
            "translation_label": rng.randn(b, 3) * 0.1,
            "size_label": rng.rand(b, 3),
            "qo": inputs["qo"],
        }
        return inputs, labels

    # ---- torch side: the reference recurrence, verbatim, in double
    m = ref.ist_net.IST_Net(nclass=6, freeze_world_enhancer=freeze)
    _randomize(torch, m, 51)
    m.double().train()
    for mod in m.modules():
        if isinstance(mod, torch.nn.Dropout2d):
            mod.eval()
    if freeze:  # train.py:116-118
        for name, param in m.named_parameters():
            if "world_enhancer" in name:
                param.requires_grad = False
        opt_params = filter(lambda p: p.requires_grad, m.parameters())
    else:
        opt_params = m.parameters()
    # solver.py:40-43: lr/weight_decay only — betas/eps stay TORCH DEFAULTS
    optimizer = torch.optim.Adam(opt_params, lr=1e-4, weight_decay=0.0)
    lr_sched = torch.optim.lr_scheduler.CyclicLR(
        optimizer, base_lr=1e-5, max_lr=1e-3,
        step_size_up=max_epoch * iters_per_epoch // 6, mode="triangular",
        cycle_momentum=False)  # solver.py:45-46
    bnm_lmbd = lambda it: max(
        bn_cfg["bn_momentum"] * bn_cfg["bn_decay"] ** (int(it / bn_cfg["decay_step"])),
        bn_cfg["bnm_clip"])  # solver.py:48

    def set_bn_momentum(mom):
        for mod in m.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                mod.momentum = mom

    # the initial weights must be f32-representable: conversion goes through
    # float32 (the production checkpoint dtype) and both sides then run the
    # SAME f64 values
    init_sd_f32 = {k: (v.detach().numpy() if v.dtype not in
                       (torch.float32, torch.float64)
                       else v.detach().numpy().astype(np.float32))
                   for k, v in m.state_dict().items()}
    with torch.no_grad():
        for k, v in m.state_dict().items():
            if v.dtype == torch.float64:
                v.copy_(torch.from_numpy(init_sd_f32[k].astype(np.float64)))

    cfg_t = types.SimpleNamespace(
        loss=types.SimpleNamespace(gamma1=gamma1, gamma2=gamma2),
        freeze_world_enhancer=freeze)
    t_losses = []
    cum_lr = 0.0  # the max distance a pure-noise element can random-walk
    for k in range(steps):
        inputs, labels = make_data(k)
        lr_sched.step(k)          # BEFORE the update (solver.py:88-89)
        cum_lr += optimizer.param_groups[0]["lr"]
        set_bn_momentum(bnm_lmbd(k))  # solver.py:91-92
        optimizer.zero_grad()
        t_in = {
            "rgb": torch.from_numpy(np.ascontiguousarray(
                np.transpose(inputs["rgb"], (0, 3, 1, 2)))),
            "pts": torch.from_numpy(inputs["pts"]),
            "choose": torch.from_numpy(inputs["choose"]),
            "category_label": torch.from_numpy(inputs["category_label"]),
            "qo": torch.from_numpy(inputs["qo"]),
        }
        out = m(t_in)
        for kk, vv in labels.items():
            out[kk] = torch.from_numpy(vv)
        loss = ref.ist_net.SupervisedLoss(cfg_t)(out)
        loss.backward()
        optimizer.step()
        t_losses.append(float(loss.detach()))
        if k == 0:
            lr0 = optimizer.param_groups[0]["lr"]
            t_step1_sd = {kk: v.detach().numpy().copy()
                          for kk, v in m.state_dict().items()}
    t_final_sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    # ---- flax side: make_optimizer + make_train_step, x64
    trees = C.convert_state_dict(init_sd_f32, "ist_net")
    jax.config.update("jax_enable_x64", True)
    precision.set_compute_dtype(np.float64)
    try:
        import jax.numpy as jnp

        from istnet_tpu.models.ist_net import ISTNet, supervised_loss
        from istnet_tpu.train.train_state import (
            create_train_state, make_optimizer, make_train_step)
        from istnet_tpu.utils.config import Config

        to64 = lambda t: jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), t)
        params = to64(trees["params"])
        batch_stats = to64(trees["batch_stats"])
        # the reference yaml's betas/eps are PRESENT in the config and
        # IGNORED by its solver; passing them here (not as adam_betas/
        # adam_eps) must leave the trajectory on torch defaults
        cfg_j = Config({
            "optimizer": {"name": "Adam", "lr": 1e-4, "betas": [0.5, 0.999],
                          "eps": 1e-6, "weight_decay": 0.0},
            "max_epoch": max_epoch,
            "bn": bn_cfg,
        })
        model = ISTNet(nclass=6, freeze_world_enhancer=freeze)
        tx, _ = make_optimizer(cfg_j, iters_per_epoch, params,
                               frozen_prefix="world_enhancer" if freeze else None)

        def loss_fn(end_points, labels):
            return supervised_loss(end_points, labels, gamma1=gamma1,
                                   gamma2=gamma2, freeze_world_enhancer=freeze)

        step_fn = jax.jit(make_train_step(model, loss_fn, tx, cfg_j.bn))
        state = create_train_state(params, batch_stats, tx)
        j_losses = []
        for k in range(steps):
            inputs, labels = make_data(k)
            batch = {
                "inputs": {
                    "rgb": jnp.asarray(inputs["rgb"]),
                    "pts": jnp.asarray(inputs["pts"]),
                    "choose": jnp.asarray(inputs["choose"], jnp.int32),
                    "category_label": jnp.asarray(inputs["category_label"],
                                                  jnp.int32),
                    "qo": jnp.asarray(inputs["qo"]),
                },
                "labels": {kk: jnp.asarray(vv) for kk, vv in labels.items()},
            }
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(k))
            j_losses.append(float(metrics["loss"]))
            if k == 0:
                j_step1 = C.export_state_dict(
                    {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)},
                    "ist_net")
        j_final = C.export_state_dict(
            {"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats)}, "ist_net")
    finally:
        jax.config.update("jax_enable_x64", False)
        precision.set_compute_dtype(np.float32)

    np.testing.assert_allclose(j_losses, t_losses, rtol=1e-5)

    # --- STEP-1 exact comparison: the sharpest instrument. After ONE update
    # both sides hold params = init - lr0 * mhat/(sqrt(vhat)+eps) computed
    # from gradients that agree to f64 roundoff (measured relmax ~5e-8), so
    # the 90% bulk must match to well under 0.5% of lr0 — which pins base_lr,
    # betas, eps (a 1e-6-eps mistake shifts the bulk by ~1% of lr0) and the
    # freeze masking. Outliers: elements with |g| <~ eps get
    # delta-ratio ~ delta-g/eps = O(1), so the hard cap is ~lr0.
    assert set(j_step1) == set(t_step1_sd)
    for key in sorted(t_step1_sd):
        if key.endswith("num_batches_tracked") or ".feats.fc." in key:
            continue
        diff1 = np.abs(np.asarray(j_step1[key], np.float64) - t_step1_sd[key])
        assert diff1.max() <= 1e-9 + 1.2 * lr0, (
            f"step1 {key}: max diff {diff1.max():.3e} vs lr0 {lr0:.1e}")
        if diff1.size >= 10_000:
            assert np.quantile(diff1, 0.9) <= 1e-9 + 0.005 * lr0, (
                f"step1 {key}: 90% quantile {np.quantile(diff1, 0.9):.3e}")

    assert set(j_final) == set(t_final_sd)
    for key in sorted(t_final_sd):
        if key.endswith("num_batches_tracked") or ".feats.fc." in key:
            continue
        t_v = t_final_sd[key]
        j_v = j_final[key]
        # tolerance scaled to how much this tensor actually MOVED: residual
        # f64 drift comes only from the deliberately-f32 interpolation
        # islands (~1e-6 relative on grads), so 1e-3 of the trajectory
        # displacement is a wide margin while zero-motion tensors (frozen
        # subtree!) are compared near-exactly
        moved = np.abs(t_v - init_sd_f32[key].astype(np.float64)).max()
        atol = 1e-9 + 1e-3 * moved
        diff = np.abs(np.asarray(j_v, np.float64) - t_v)
        # Two noise classes survive f64 (both bounded by the cumulative LR,
        # since Adam's per-step move is at most ~lr):
        # (a) params whose TRUE grad ~cancels (a bias feeding a downstream
        #     BN: the normalization removes any bias shift) random-walk by
        #     +-lr/step on reduction-order noise in BOTH frameworks,
        #     uncorrelated — measured: 5/16 elements of an SA BN bias at
        #     4% of cum_lr;
        # (b) isolated weight elements whose grad reduction cancels
        #     near-perfectly sign-flip the same way — measured 3-4 per 1e5.
        # A persistent-sign noise walk can physically reach ~cum_lr (one
        # FP conv element measured 0.59*cum_lr), so the max criterion is a
        # gross-outlier cap; BROAD shifts — the signature of a real
        # composition bug (schedule off-by-one, wrong betas/eps, bad
        # momentum: every element moves by ~1e-4, >> the 1e-6-scale atol) —
        # are caught by the bulk quantile below.
        assert diff.max() <= atol + 1.5 * cum_lr, (
            f"{key}: max diff {diff.max():.3e} vs moved {moved:.3e}, "
            f"cum_lr {cum_lr:.3e}")
        if diff.size >= 10_000:  # bulk agreement on large tensors
            # Multi-step noise floor: Adam's first step jolts every param by
            # ~+-lr; many coordinates' gradients then flip sign, the m
            # accumulator near-cancels, and those ratios become sensitive to
            # f64 roundoff — a BULK walk of ~1% of cum_lr that torch-vs-torch
            # with a different summation order would show too (one-step
            # grads agree to relmax ~5e-8, measured). An LR-schedule
            # off-by-one still shifts the bulk by ~0.64*cum_lr*|ratio|
            # (~1e-4 here), 5-10x above these bounds; the step-1 comparison
            # above pins the optimizer constants far tighter.
            assert np.quantile(diff, 0.9) <= atol + 0.02 * cum_lr, (
                f"{key}: 90% quantile {np.quantile(diff, 0.9):.3e} "
                f"exceeds {atol + 0.02 * cum_lr:.3e}")
            # The extreme tail is noise-dominated and NOT worth pinning
            # tightly: the worst 0.1% of elements of individual tensors
            # measured 0.06-0.09*cum_lr across runs (an FP conv, then an SA
            # conv — different tensors on different tolerance-probe runs),
            # pure persistent-sign random walk. A real composition bug moves
            # the BULK (above); this is only a net between the bulk and the
            # gross-outlier cap, at 2.8x the measured noise.
            assert np.quantile(diff, 0.999) <= atol + 0.25 * cum_lr, (
                f"{key}: 99.9% quantile {np.quantile(diff, 0.999):.3e} "
                f"exceeds {atol + 0.25 * cum_lr:.3e}")
        if freeze and key.startswith("world_enhancer.") and "running" not in key:
            assert moved == 0.0, f"frozen param moved on the torch side: {key}"


# ---------------------------------------------------------------------------
# 3. reverse direction (flax -> torch export)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("model", ["ist_net", "posenet_gt"])
def test_export_roundtrips_exactly(model):
    """torch sd -> flax trees -> torch sd is the identity on every mapped
    tensor (transforms are pure transposes; nothing is lost either way)."""
    sd = _random_sd(model, seed=21)
    trees = C.convert_state_dict(sd, model)
    back = C.export_state_dict(trees, model)
    assert set(back) == set(sd)
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or ".feats.fc." in k:
            continue  # nbt is bookkeeping; the trunk fc is dead weight
        np.testing.assert_array_equal(back[k], v, err_msg=k)


def test_export_folds_trained_dense_bias_into_bn_mean():
    """Natively-trained SharedMLP dense biases (absent in torch) fold into
    the BN running mean: BN(y + b) == BN'(y) with mean' = mean - b."""
    sd = _random_sd("posenet_gt", seed=22)
    trees = C.convert_state_dict(sd, "posenet_gt")
    p = trees["params"]["pts_extractor"]["PointnetSAModuleMSG_0"]["SharedMLP_0"]
    bias = np.linspace(-1, 1, p["TorchDense_1"]["Dense_0"]["bias"].shape[0],
                       dtype=np.float32)
    p["TorchDense_1"]["Dense_0"]["bias"] = bias
    back = C.export_state_dict(trees, "posenet_gt")
    key = "pts_extractor.SA_modules.0.mlps.0.layer1.normlayer.bn.running_mean"
    np.testing.assert_allclose(back[key], sd[key] - bias, atol=1e-6)


def test_export_freeze_checkpoint():
    sd = {k: v for k, v in _random_sd("ist_net", seed=23).items()
          if not k.startswith("world_enhancer.pose_estimator.")}
    trees = C.convert_state_dict(sd, "ist_net")
    back = C.export_state_dict(trees, "ist_net")
    assert set(back) == set(sd)


@pytest.mark.slow
@needs_reference
def test_bf16_loss_trend_matches_torch_f32(ref, monkeypatch):
    """PRODUCTION-precision trajectory insurance (VERDICT r4 item 1): the
    f64 4-step trajectory test pins bitwise behavior but cannot see a
    bf16-only or long-horizon schedule bug. Here the real deployment
    precision (bf16 compute policy) runs 50 update steps against the
    reference's f32 recurrence on identical data, and the LOSS CURVES must
    stay inside a calibrated envelope. The compressed schedule sweeps the
    full LR band (1e-5 -> 1e-3 across the run) and several BN-momentum
    decays, so an off-by-one in either schedule, a broken BN EMA, or a bf16
    accumulation defect all push the curves apart far beyond the envelope.

    Calibration (healthy runs): per-step relative gap starts ~1e-3 and
    random-walks under bf16 rounding; measured max over 50 steps ~= see
    bounds below (asserted with ~3x headroom).
    """
    import torch

    import jax

    from istnet_tpu.nn import layers, precision

    _install_ext_stubs(torch)
    resnet_mod = sys.modules["resnet"]
    monkeypatch.setattr(resnet_mod, "resnet18",
                        lambda pretrained=False: resnet_mod.ResNet(
                            resnet_mod.BasicBlock, [2, 2, 2, 2]))
    monkeypatch.setattr(layers.Dropout2d, "__call__",
                        lambda self, x, train: x)

    # img must keep the PSP map divisible by the pyramid sizes (48 -> 6x6)
    steps, b, n, img = 50, 2, 1024, 48
    max_epoch, iters_per_epoch = 1, 300   # step_size_up = 50 = the run
    bn_cfg = dict(bn_momentum=0.9, bn_decay=0.5, decay_step=10, bnm_clip=0.01)
    gamma1, gamma2 = 8.0, 10.0

    def make_data(k):
        rng = np.random.RandomState(500 + k)
        inputs = {
            "rgb": rng.randn(b, img, img, 3).astype(np.float32),
            "pts": (rng.randn(b, n, 3) * 0.1).astype(np.float32),
            "choose": rng.randint(0, img * img, (b, n)).astype(np.int64),
            "category_label": np.array([k % 6, (k + 3) % 6], np.int64),
            "qo": ((rng.rand(b, n, 3) - 0.5) * 0.4).astype(np.float32),
        }
        labels = {
            "rotation_label": rng.randn(b, 3, 3).astype(np.float32),
            "translation_label": (rng.randn(b, 3) * 0.1).astype(np.float32),
            "size_label": rng.rand(b, 3).astype(np.float32),
            "qo": inputs["qo"],
        }
        return inputs, labels

    # ---- torch reference recurrence, f32 (solver.py:40-49, 85-122)
    m = ref.ist_net.IST_Net(nclass=6, freeze_world_enhancer=False)
    _randomize(torch, m, 77)
    m.train()
    for mod in m.modules():
        if isinstance(mod, torch.nn.Dropout2d):
            mod.eval()
    optimizer = torch.optim.Adam(m.parameters(), lr=1e-4, weight_decay=0.0)
    lr_sched = torch.optim.lr_scheduler.CyclicLR(
        optimizer, base_lr=1e-5, max_lr=1e-3,
        step_size_up=max_epoch * iters_per_epoch // 6, mode="triangular",
        cycle_momentum=False)
    bnm_lmbd = lambda it: max(
        bn_cfg["bn_momentum"] * bn_cfg["bn_decay"] ** (int(it / bn_cfg["decay_step"])),
        bn_cfg["bnm_clip"])
    init_sd = {k: v.detach().numpy().copy() for k, v in m.state_dict().items()}

    cfg_t = types.SimpleNamespace(
        loss=types.SimpleNamespace(gamma1=gamma1, gamma2=gamma2),
        freeze_world_enhancer=False)
    t_losses = []
    for k in range(steps):
        inputs, labels = make_data(k)
        lr_sched.step(k)
        for mod in m.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                mod.momentum = bnm_lmbd(k)
        optimizer.zero_grad()
        t_in = {
            "rgb": torch.from_numpy(np.ascontiguousarray(
                np.transpose(inputs["rgb"], (0, 3, 1, 2)))),
            "pts": torch.from_numpy(inputs["pts"]),
            "choose": torch.from_numpy(inputs["choose"]),
            "category_label": torch.from_numpy(inputs["category_label"]),
            "qo": torch.from_numpy(inputs["qo"]),
        }
        out = m(t_in)
        for kk, vv in labels.items():
            out[kk] = torch.from_numpy(vv)
        loss = ref.ist_net.SupervisedLoss(cfg_t)(out)
        loss.backward()
        optimizer.step()
        t_losses.append(float(loss.detach()))

    # ---- flax side: SAME init, bf16 compute policy (deployment precision)
    import jax.numpy as jnp

    from istnet_tpu.models.ist_net import ISTNet, supervised_loss
    from istnet_tpu.train.train_state import (
        create_train_state, make_optimizer, make_train_step)
    from istnet_tpu.utils.config import Config

    trees = C.convert_state_dict(init_sd, "ist_net")
    precision.set_compute_dtype(jnp.bfloat16)
    try:
        cfg_j = Config({
            "optimizer": {"name": "Adam", "lr": 1e-4, "weight_decay": 0.0},
            "max_epoch": max_epoch,
            "bn": bn_cfg,
        })
        model = ISTNet(nclass=6, freeze_world_enhancer=False)
        tx, _ = make_optimizer(cfg_j, iters_per_epoch, trees["params"])

        def loss_fn(end_points, labels_):
            return supervised_loss(end_points, labels_, gamma1=gamma1,
                                   gamma2=gamma2, freeze_world_enhancer=False)

        step_fn = jax.jit(make_train_step(model, loss_fn, tx, cfg_j.bn))
        state = create_train_state(trees["params"], trees["batch_stats"], tx)
        j_losses = []
        for k in range(steps):
            inputs, labels = make_data(k)
            batch = {
                "inputs": {
                    "rgb": jnp.asarray(inputs["rgb"]),
                    "pts": jnp.asarray(inputs["pts"]),
                    "choose": jnp.asarray(inputs["choose"], jnp.int32),
                    "category_label": jnp.asarray(inputs["category_label"],
                                                  jnp.int32),
                    "qo": jnp.asarray(inputs["qo"]),
                },
                "labels": {kk: jnp.asarray(vv) for kk, vv in labels.items()},
            }
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(k))
            j_losses.append(float(metrics["loss"]))
    finally:
        precision.set_compute_dtype(jnp.float32)

    t_arr, j_arr = np.asarray(t_losses), np.asarray(j_losses)
    assert np.isfinite(j_arr).all()
    rel = np.abs(j_arr - t_arr) / t_arr
    # healthy-run calibration (measured): rel[:5].max 4.6e-3 (pure bf16
    # rounding, no divergence yet), overall max 8.8e-2 by step ~43 (the
    # bf16 trajectory random-walks away under the 1e-3 LR peak — expected
    # chaos, not error). A schedule off-by-one (e.g. LR stuck at base)
    # or a broken BN EMA produces O(50%+) divergence; bounds carry ~2x
    # headroom over the healthy walk while still far below failure modes.
    assert rel[:5].max() < 2e-2, rel[:5]
    assert rel.max() < 2e-1, (rel.argmax(), rel.max())
    gap = abs(j_arr[-10:].mean() - t_arr[-10:].mean()) / t_arr[-10:].mean()
    assert gap < 1e-1, (t_arr[-10:], j_arr[-10:])
