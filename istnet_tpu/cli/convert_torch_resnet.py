"""Convert torchvision ResNet-18 ImageNet weights into our flax trunk.

The reference initializes its RGB encoder from torchvision ImageNet weights
(``model/resnet.py:205-214``, ``model/modules.py:52``). This environment has
no network egress, so the conversion is offline:

    python -m istnet_tpu.cli.convert_torch_resnet \
        --torch_ckpt resnet18-5c106cde.pth --out resnet18_imagenet.npz

Then pass ``--pretrained_backbone resnet18_imagenet.npz`` to training (or call
``load_into_params``). Mapping: torch conv (O, I, kh, kw) -> flax (kh, kw, I, O);
BN weight/bias -> scale/bias params, running stats -> batch_stats. Our trunk's
layer3/4 keep ImageNet weights exactly (same graph — the reference's network
is stride-8 with 1x1 downsamples, identical topology to torchvision's up to
stride, and strides carry no weights).
"""

from __future__ import annotations

import argparse

import numpy as np


def torch_sd_to_numpy(torch_ckpt_path: str) -> dict:
    import torch

    sd = torch.load(torch_ckpt_path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items() if "fc." not in k}


_TRUNK_BLOCKS = [("layer1", 64), ("layer2", 128), ("layer3", 256), ("layer4", 512)]


def build_flax_trees(np_sd: dict) -> tuple[dict, dict]:
    """torchvision ResNet state dict -> (params, batch_stats) subtrees
    matching ``istnet_tpu.nn.resnet_psp.ResNet18Trunk``'s module naming.

    Works for every factory backend: per-stage block counts and the block
    type (BasicBlock conv1/conv2 vs Bottleneck conv1..conv3) are detected
    from the keys, so resnet18/34 (BasicBlock) and resnet50/101/152
    (Bottleneck) all convert. Weights are stride-independent, so the
    stride-8 modification needs no remapping (module docstring)."""

    def conv(name):
        return {"kernel": np.transpose(np_sd[name + ".weight"], (2, 3, 1, 0))}

    def bn(name):
        p = {"scale": np_sd[name + ".weight"], "bias": np_sd[name + ".bias"]}
        s = {"mean": np_sd[name + ".running_mean"], "var": np_sd[name + ".running_var"]}
        return p, s

    bottleneck = "layer1.0.conv3.weight" in np_sd
    n_convs = 3 if bottleneck else 2
    block_name = "Bottleneck" if bottleneck else "BasicBlock"

    # flax auto-names <Block>_0..N-1 in declaration order; each block:
    # _RConv_0..n-1 (+ _RConv_n downsample), BatchNorm_0..n-1 (+n)
    blk = 0
    flax_blocks_p: dict = {}
    flax_blocks_s: dict = {}
    for lname, _ in _TRUNK_BLOCKS:
        n_blocks = 1 + max(int(k.split(".")[1]) for k in np_sd
                           if k.startswith(lname + "."))
        for sub in range(n_blocks):
            prefix = f"{lname}.{sub}"
            p: dict = {}
            s: dict = {}
            for ci in range(n_convs):
                p[f"_RConv_{ci}"] = {"Conv_0": conv(f"{prefix}.conv{ci + 1}")}
                bp, bs = bn(f"{prefix}.bn{ci + 1}")
                p[f"BatchNorm_{ci}"] = bp
                s[f"BatchNorm_{ci}"] = bs
            if prefix + ".downsample.0.weight" in np_sd:
                p[f"_RConv_{n_convs}"] = {"Conv_0": conv(prefix + ".downsample.0")}
                bp, bs = bn(prefix + ".downsample.1")
                p[f"BatchNorm_{n_convs}"] = bp
                s[f"BatchNorm_{n_convs}"] = bs
            flax_blocks_p[f"{block_name}_{blk}"] = p
            flax_blocks_s[f"{block_name}_{blk}"] = s
            blk += 1

    bn0_p, bn0_s = bn("bn1")
    trunk_p = {"_RConv_0": {"Conv_0": conv("conv1")},
               "BatchNorm_0": bn0_p, **flax_blocks_p}
    trunk_s = {"BatchNorm_0": bn0_s, **flax_blocks_s}
    return trunk_p, trunk_s


def load_into_params(params: dict, batch_stats: dict, npz_path: str,
                     encoder_name: str = "rgb_cam_extractor") -> tuple[dict, dict]:
    """Graft converted trunk weights into a full model's variable trees."""
    import jax

    data = np.load(npz_path, allow_pickle=True)
    trunk_p = data["params"].item()
    trunk_s = data["batch_stats"].item()

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    enc = dict(params[encoder_name])
    enc_trunk = dict(enc["ResNet18Trunk_0"])
    _merge(enc_trunk, trunk_p)
    enc["ResNet18Trunk_0"] = enc_trunk
    params = dict(params)
    params[encoder_name] = enc

    batch_stats = dict(batch_stats)
    encs = dict(batch_stats[encoder_name])
    encs_trunk = dict(encs.get("ResNet18Trunk_0", {}))
    _merge(encs_trunk, trunk_s)
    encs["ResNet18Trunk_0"] = encs_trunk
    batch_stats[encoder_name] = encs
    return params, batch_stats


def _merge(dst: dict, src: dict) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            dst[k] = dict(dst[k])
            _merge(dst[k], v)
        else:
            dst[k] = np.asarray(v, np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--out", default="resnet18_imagenet.npz")
    args = p.parse_args()
    np_sd = torch_sd_to_numpy(args.torch_ckpt)
    trunk_p, trunk_s = build_flax_trees(np_sd)
    np.savez(args.out, params=trunk_p, batch_stats=trunk_s)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
