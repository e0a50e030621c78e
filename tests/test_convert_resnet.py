"""Torchvision ResNet-18 weight conversion: structure + numerical parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from istnet_tpu.cli.convert_torch_resnet import build_flax_trees
from istnet_tpu.nn.resnet_psp import ResNet18Trunk


def _random_torch_sd():
    """Minimal torch-format resnet18 state dict with random values."""
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = torch.randn(o, i, k, k) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = torch.rand(c) + 0.5
        sd[name + ".bias"] = torch.randn(c) * 0.1
        sd[name + ".running_mean"] = torch.randn(c) * 0.1
        sd[name + ".running_var"] = torch.rand(c) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    spec = [("layer1", 64, 64, False), ("layer2", 128, 64, True),
            ("layer3", 256, 128, True), ("layer4", 512, 256, True)]
    for lname, c, c_in, ds in spec:
        for sub in (0, 1):
            ci = c_in if sub == 0 else c
            conv(f"{lname}.{sub}.conv1", c, ci, 3)
            bn(f"{lname}.{sub}.bn1", c)
            conv(f"{lname}.{sub}.conv2", c, c, 3)
            bn(f"{lname}.{sub}.bn2", c)
            if sub == 0 and ds:
                conv(f"{lname}.{sub}.downsample.0", c, ci, 1)
                bn(f"{lname}.{sub}.downsample.1", c)
    return sd


def test_converted_tree_matches_flax_structure():
    sd = {k: v.numpy() for k, v in _random_torch_sd().items()}
    trunk_p, trunk_s = build_flax_trees(sd)

    model = ResNet18Trunk()
    x = jnp.zeros((1, 48, 48, 3))
    variables = jax.jit(model.init, static_argnums=2)(jax.random.PRNGKey(0), x, False)

    def paths(tree, prefix=""):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, prefix + k + "/")
            else:
                out.add(prefix + k + ":" + str(np.shape(v)))
        return out

    assert paths(trunk_p) == paths(variables["params"])
    assert paths(trunk_s) == paths(variables["batch_stats"])


def test_converted_weights_match_torch_forward():
    """Tiny end-to-end parity: torch resnet18 trunk (stride-8 variant) vs flax
    with converted weights, eval mode."""
    torch.manual_seed(0)
    sd_t = _random_torch_sd()
    sd = {k: v.numpy() for k, v in sd_t.items()}
    trunk_p, trunk_s = build_flax_trees(sd)

    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)

    model = ResNet18Trunk()
    out_flax = jax.jit(lambda p, s, v: model.apply(
        {"params": p, "batch_stats": s}, v, False))(trunk_p, trunk_s, jnp.asarray(x))

    # torch reference of the ACTUAL reference network: stride-8, dilation-1
    import torch.nn as tnn
    import torch.nn.functional as F

    def bn(name, v):
        return F.batch_norm(v, torch.as_tensor(sd[name + ".running_mean"]),
                            torch.as_tensor(sd[name + ".running_var"]),
                            torch.as_tensor(sd[name + ".weight"]),
                            torch.as_tensor(sd[name + ".bias"]), False, 0.0, 1e-5)

    def conv(name, v, stride=1, padding=0):
        return F.conv2d(v, torch.as_tensor(sd[name + ".weight"]), None,
                        stride=stride, padding=padding)

    v = torch.as_tensor(np.transpose(x, (0, 3, 1, 2)))
    v = F.relu(bn("bn1", conv("conv1", v, stride=2, padding=3)))
    v = F.max_pool2d(v, 3, 2, 1)
    strides = {"layer1": 1, "layer2": 2, "layer3": 1, "layer4": 1}
    for lname in ("layer1", "layer2", "layer3", "layer4"):
        for sub in (0, 1):
            stride = strides[lname] if sub == 0 else 1
            res = v
            o = F.relu(bn(f"{lname}.{sub}.bn1",
                          conv(f"{lname}.{sub}.conv1", v, stride=stride, padding=1)))
            o = bn(f"{lname}.{sub}.bn2", conv(f"{lname}.{sub}.conv2", o, padding=1))
            if f"{lname}.{sub}.downsample.0.weight" in sd:
                res = bn(f"{lname}.{sub}.downsample.1",
                         conv(f"{lname}.{sub}.downsample.0", v, stride=stride))
            v = F.relu(o + res)
    out_torch = np.transpose(v.numpy(), (0, 2, 3, 1))
    # tolerance covers XLA's default bf16-pass conv precision vs torch f32
    np.testing.assert_allclose(np.asarray(out_flax), out_torch, rtol=1e-2, atol=5e-3)


def test_load_into_full_model_params():
    """npz -> load_into_params grafts the trunk into a full ISTNet tree."""
    import tempfile

    from istnet_tpu.cli.convert_torch_resnet import load_into_params
    from istnet_tpu.models.ist_net import ISTNet

    sd = {k: v.numpy() for k, v in _random_torch_sd().items()}
    trunk_p, trunk_s = build_flax_trees(sd)
    with tempfile.TemporaryDirectory() as td:
        npz = td + "/trunk.npz"
        np.savez(npz, params=trunk_p, batch_stats=trunk_s)

        model = ISTNet(nclass=6, sa_npoints=(32, 16, 8, 8))
        x = {
            "rgb": jnp.zeros((1, 48, 48, 3)),
            "pts": jnp.zeros((1, 64, 3)),
            "choose": jnp.zeros((1, 64), jnp.int32),
            "category_label": jnp.zeros((1,), jnp.int32),
            "qo": jnp.zeros((1, 64, 3)),
        }
        variables = jax.jit(model.init, static_argnames="train")(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=True)
        params, stats = load_into_params(variables["params"], variables["batch_stats"], npz)
    got = params["rgb_cam_extractor"]["ResNet18Trunk_0"]["_RConv_0"]["Conv_0"]["kernel"]
    want = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(np.asarray(got), want)
    got_s = stats["rgb_cam_extractor"]["ResNet18Trunk_0"]["BatchNorm_0"]["mean"]
    np.testing.assert_allclose(np.asarray(got_s), sd["bn1.running_mean"])


def _random_torch_sd_arch(arch):
    """torch-format state dict skeleton for any factory backend."""
    depths = {"resnet34": (3, 4, 6, 3), "resnet50": (3, 4, 6, 3)}[arch]
    bottleneck = arch == "resnet50"
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = torch.randn(o, i, k, k) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = torch.rand(c) + 0.5
        sd[name + ".bias"] = torch.randn(c) * 0.1
        sd[name + ".running_mean"] = torch.randn(c) * 0.1
        sd[name + ".running_var"] = torch.rand(c) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    exp = 4 if bottleneck else 1
    c_in = 64
    for (lname, c), nb in zip([("layer1", 64), ("layer2", 128),
                               ("layer3", 256), ("layer4", 512)], depths):
        for sub in range(nb):
            prefix = f"{lname}.{sub}"
            ci = c_in if sub == 0 else c * exp
            if bottleneck:
                conv(prefix + ".conv1", c, ci, 1)
                bn(prefix + ".bn1", c)
                conv(prefix + ".conv2", c, c, 3)
                bn(prefix + ".bn2", c)
                conv(prefix + ".conv3", c * 4, c, 1)
                bn(prefix + ".bn3", c * 4)
            else:
                conv(prefix + ".conv1", c, ci, 3)
                bn(prefix + ".bn1", c)
                conv(prefix + ".conv2", c, c, 3)
                bn(prefix + ".bn2", c)
            if sub == 0 and ci != c * exp:
                conv(prefix + ".downsample.0", c * exp, ci, 1)
                bn(prefix + ".downsample.1", c * exp)
        c_in = c * exp
    return sd


@pytest.mark.parametrize("arch", ["resnet34", "resnet50"])
def test_converted_tree_matches_flax_structure_other_backends(arch):
    """The converter detects block counts and type from the keys, so the
    resnet34 (BasicBlock) and resnet50 (Bottleneck) factory backends
    convert into exactly the trunk trees our modules create."""
    sd = {k: v.numpy() for k, v in _random_torch_sd_arch(arch).items()}
    trunk_p, trunk_s = build_flax_trees(sd)

    model = ResNet18Trunk(backend=arch)
    x = jnp.zeros((1, 48, 48, 3))
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), x, False)

    def paths(tree, prefix=""):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, prefix + k + "/")
            else:
                out.add(prefix + k + ":" + str(np.shape(v)))
        return out

    assert paths(trunk_p) == paths(variables["params"])
    assert paths(trunk_s) == paths(variables["batch_stats"])
