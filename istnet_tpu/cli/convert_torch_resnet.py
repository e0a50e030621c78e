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
    """torch resnet18 state dict -> (params, batch_stats) subtrees matching
    ``istnet_tpu.nn.resnet_psp.ResNet18Trunk``'s module naming."""

    def conv(name):
        return {"kernel": np.transpose(np_sd[name + ".weight"], (2, 3, 1, 0))}

    def bn(name):
        p = {"scale": np_sd[name + ".weight"], "bias": np_sd[name + ".bias"]}
        s = {"mean": np_sd[name + ".running_mean"], "var": np_sd[name + ".running_var"]}
        return p, s

    params: dict = {}
    stats: dict = {}

    def put(path, conv_p, bn_p, bn_s):
        params[path + "_conv"] = conv_p
        params[path + "_bn"] = bn_p
        stats[path + "_bn"] = bn_s

    bn0_p, bn0_s = bn("bn1")
    params["Conv_0"] = conv("conv1")
    params["BatchNorm_0"] = bn0_p
    stats["BatchNorm_0"] = bn0_s

    # flax auto-names BasicBlock_0..7 in declaration order; each block:
    # _RConv_0/_RConv_1 (+ _RConv_2 downsample), BatchNorm_0/1 (+2)
    blk = 0
    flax_blocks_p: dict = {}
    flax_blocks_s: dict = {}
    for lname, _ in _TRUNK_BLOCKS:
        for sub in (0, 1):
            prefix = f"{lname}.{sub}"
            p: dict = {}
            s: dict = {}
            p["_RConv_0"] = {"Conv_0": conv(prefix + ".conv1")}
            bp, bs = bn(prefix + ".bn1")
            p["BatchNorm_0"] = bp
            s["BatchNorm_0"] = bs
            p["_RConv_1"] = {"Conv_0": conv(prefix + ".conv2")}
            bp, bs = bn(prefix + ".bn2")
            p["BatchNorm_1"] = bp
            s["BatchNorm_1"] = bs
            if prefix + ".downsample.0.weight" in np_sd:
                p["_RConv_2"] = {"Conv_0": conv(prefix + ".downsample.0")}
                bp, bs = bn(prefix + ".downsample.1")
                p["BatchNorm_2"] = bp
                s["BatchNorm_2"] = bs
            flax_blocks_p[f"BasicBlock_{blk}"] = p
            flax_blocks_s[f"BasicBlock_{blk}"] = s
            blk += 1

    trunk_p = {"_RConv_0": {"Conv_0": params["Conv_0"]},
               "BatchNorm_0": params["BatchNorm_0"], **flax_blocks_p}
    trunk_s = {"BatchNorm_0": stats["BatchNorm_0"], **flax_blocks_s}
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
