"""Convert a trained reference IST-Net / PoseNetGT ``.pth`` checkpoint into
this framework's flax variable trees.

The reference publishes trained checkpoints (``/root/reference/README.md``
model-zoo links, saved by gorilla's solver, ``utils/solver.py:64-68``); a user
switching to the TPU rebuild must be able to evaluate them without retraining.
This converter maps EVERY tensor of the torch ``state_dict`` onto the
corresponding leaf of our ``{params, batch_stats}`` trees (layouts transposed
to channel-last / MXU-Dense conventions) with strict both-ways accounting:
unmapped torch keys or unfilled flax leaves are hard errors.

    python -m istnet_tpu.cli.convert_torch_istnet \
        --torch_ckpt ist_net_default.pth --model ist_net --out ist_net_tpu.npz

The ``.npz`` holds ``params`` / ``batch_stats`` object trees loadable with
``load_npz``; ``cli/test.py --torch_checkpoint x.pth`` converts on the fly.

Layout conventions (the inverse of ``convert_torch_resnet``'s where shared):
  - Conv2d weight (O, I, kh, kw)  -> flax Conv kernel (kh, kw, I, O)
  - Conv1d weight (O, I, 1)       -> Dense kernel (I, O)  [1x1 conv == matmul]
  - Linear weight (O, I)          -> Dense kernel (I, O)
  - BatchNorm{1,2}d weight/bias   -> params scale/bias;
    running_mean/var              -> batch_stats mean/var
  - PReLU weight (1,)             -> PReLU alpha (1,)
  - ``num_batches_tracked``       -> dropped (momentum bookkeeping; our BN EMA
                                     carries no step counter)
  - SharedMLP convs are bias-free in torch (BN absorbs it); our TorchDense
    always has a bias -> filled with zeros (numerically identical).

Module-name map (torch -> flax), pinned by tests/test_convert_istnet.py
against both a full key manifest and REAL torch forwards of the pure-torch
submodules:
  - ``model.feats.*``             -> ``ResNet18Trunk_0/*`` (reference
    ``model/resnet.py:182-202``; reuses convert_torch_resnet.build_flax_trees)
  - ``model.psp.stages.{i}.1``    -> ``PSPModule_0/TorchConv_{i}``,
    ``model.psp.bottleneck``      -> ``PSPModule_0/TorchConv_4``
  - ``model.up_{1,2}``            -> ``PSPUpsample_{0,1}``; ``model.up_3`` and
    ``model.final`` map onto the split ``up3_*`` / ``final_*`` modules (the
    sparse eval head runs them per-point, resnet_psp.py:197-209)
  - ``SA_modules.{i}.mlps.{j}.layer{k}`` ->
    ``PointnetSAModuleMSG_{i}/SharedMLP_{j}/{TorchDense,BatchNorm}_{k}``
  - ``FP_modules.{i}.mlp.layer{k}`` -> ``PointnetFPModule_{3-i}/SharedMLP_0/…``
    (the reference iterates FP modules deepest-first, ``modules.py:322-327``;
    flax numbers them in call order, hence the index reversal)
  - estimator Sequentials (``modules.py:155-204``, ``ist_net.py:114-264``) ->
    ``MLP_{k}/TorchDense_{j}`` per the tables below.
"""

from __future__ import annotations

import argparse
import re

import numpy as np

from istnet_tpu.cli.convert_torch_resnet import build_flax_trees


class ConversionError(ValueError):
    pass


class _SD:
    """State-dict view that tracks which keys have been consumed."""

    def __init__(self, np_sd: dict):
        self.sd = np_sd
        self.used: set[str] = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise ConversionError(f"missing torch key: {key}")
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def drop_matching(self, pattern: str) -> int:
        rx = re.compile(pattern)
        n = 0
        for k in self.sd:
            if rx.search(k):
                self.used.add(k)
                n += 1
        return n

    def leftovers(self) -> list[str]:
        return sorted(set(self.sd) - self.used)


# --- leaf converters ---------------------------------------------------------

def _conv2d(sd: _SD, name: str, bias: bool) -> dict:
    out = {"kernel": np.transpose(sd.take(name + ".weight"), (2, 3, 1, 0))}
    if bias:
        out["bias"] = sd.take(name + ".bias")
    return out


def _dense_from_conv1d(sd: _SD, name: str) -> dict:
    w = sd.take(name + ".weight")  # (O, I, 1)
    return {"kernel": np.transpose(w[:, :, 0], (1, 0)),
            "bias": sd.take(name + ".bias")}


def _dense_from_linear(sd: _SD, name: str) -> dict:
    return {"kernel": np.transpose(sd.take(name + ".weight"), (1, 0)),
            "bias": sd.take(name + ".bias")}


def _dense_from_conv2d_1x1_nobias(sd: _SD, name: str) -> dict:
    w = sd.take(name + ".weight")  # (O, I, 1, 1)
    return {"kernel": np.transpose(w[:, :, 0, 0], (1, 0)),
            "bias": np.zeros(w.shape[0], np.float32)}


def _bn(sd: _SD, name: str) -> tuple[dict, dict]:
    p = {"scale": sd.take(name + ".weight"), "bias": sd.take(name + ".bias")}
    s = {"mean": sd.take(name + ".running_mean"),
         "var": sd.take(name + ".running_var")}
    return p, s


# --- module-family converters ------------------------------------------------

def _encoder(sd: _SD, prefix: str) -> tuple[dict, dict]:
    """``ModifiedResnet`` (torch ``<prefix>.model.*``) -> flax encoder trees."""
    pre = prefix + ".model."
    trunk_sd = {k[len(pre + "feats."):]: v for k, v in sd.sd.items()
                if k.startswith(pre + "feats.")}
    trunk_p, trunk_s = build_flax_trees(trunk_sd)
    sd.drop_matching(re.escape(pre + "feats."))  # consumed via build_flax_trees

    psp_p = {f"TorchConv_{i}":
             {"Conv_0": {"kernel": np.transpose(
                 sd.take(f"{pre}psp.stages.{i}.1.weight"), (2, 3, 1, 0))}}
             for i in range(4)}
    psp_p["TorchConv_4"] = {"Conv_0": _conv2d(sd, pre + "psp.bottleneck", bias=True)}

    params: dict = {"ResNet18Trunk_0": trunk_p, "PSPModule_0": psp_p}
    stats: dict = {"ResNet18Trunk_0": trunk_s}

    for i, up in enumerate(("up_1", "up_2")):
        bn_p, bn_s = _bn(sd, f"{pre}{up}.conv.2")
        params[f"PSPUpsample_{i}"] = {
            "TorchConv_0": {"Conv_0": _conv2d(sd, f"{pre}{up}.conv.1", bias=True)},
            "BatchNorm_0": bn_p,
            "PReLU_0": {"alpha": sd.take(f"{pre}{up}.conv.3.weight")},
        }
        stats[f"PSPUpsample_{i}"] = {"BatchNorm_0": bn_s}

    bn_p, bn_s = _bn(sd, pre + "up_3.conv.2")
    params["up3_conv"] = {"Conv_0": _conv2d(sd, pre + "up_3.conv.1", bias=True)}
    params["up3_bn"], stats["up3_bn"] = bn_p, bn_s
    params["up3_prelu"] = {"alpha": sd.take(pre + "up_3.conv.3.weight")}

    bn_p, bn_s = _bn(sd, pre + "final.1")
    params["final_conv"] = {"Conv_0": _conv2d(sd, pre + "final.0", bias=True)}
    params["final_bn"], stats["final_bn"] = bn_p, bn_s
    params["final_prelu"] = {"alpha": sd.take(pre + "final.2.weight")}
    return params, stats


def _shared_mlp(sd: _SD, prefix: str, nlayers: int) -> tuple[dict, dict]:
    """torch SharedMLP ``<prefix>.layer{k}`` -> flax SharedMLP subtree."""
    p: dict = {}
    s: dict = {}
    for k in range(nlayers):
        p[f"TorchDense_{k}"] = {
            "Dense_0": _dense_from_conv2d_1x1_nobias(sd, f"{prefix}.layer{k}.conv")}
        bn_p, bn_s = _bn(sd, f"{prefix}.layer{k}.normlayer.bn")
        p[f"BatchNorm_{k}"] = bn_p
        s[f"BatchNorm_{k}"] = bn_s
    return p, s


def _pointnet2(sd: _SD, prefix: str) -> tuple[dict, dict]:
    """``PointNet2MSG`` (modules.py:244-327) -> flax PointNet2MSG trees."""
    params: dict = {}
    stats: dict = {}
    for i in range(4):
        sa_p: dict = {}
        sa_s: dict = {}
        for j in range(2):
            p, s = _shared_mlp(sd, f"{prefix}.SA_modules.{i}.mlps.{j}", nlayers=3)
            sa_p[f"SharedMLP_{j}"] = p
            sa_s[f"SharedMLP_{j}"] = s
        params[f"PointnetSAModuleMSG_{i}"] = sa_p
        stats[f"PointnetSAModuleMSG_{i}"] = sa_s
    for i in range(4):
        # reference runs FP deepest-first (modules.py:322-327): torch index i
        # -> flax call-order index 3-i
        p, s = _shared_mlp(sd, f"{prefix}.FP_modules.{i}.mlp", nlayers=2)
        params[f"PointnetFPModule_{3 - i}"] = {"SharedMLP_0": p}
        stats[f"PointnetFPModule_{3 - i}"] = {"SharedMLP_0": s}
    return params, stats


def _seq_mlp(sd: _SD, prefix: str, torch_idx: tuple[int, ...]) -> dict:
    """torch ``Sequential(Conv1d, ReLU, …)`` -> flax ``MLP`` subtree."""
    return {f"TorchDense_{j}": {"Dense_0": _dense_from_conv1d(sd, f"{prefix}.{i}")}
            for j, i in enumerate(torch_idx)}


def _pose_heads(sd: _SD, prefix: str) -> dict:
    """rotation/translation/size Linear stacks (modules.py:183-204) ->
    ``PoseHeads_0`` (estimators.py:43-55)."""
    heads = ("rotation_estimator", "translation_estimator", "size_estimator")
    p: dict = {}
    for h, name in enumerate(heads):
        p[f"MLP_{h}"] = {
            f"TorchDense_{j}": {"Dense_0": _dense_from_linear(sd, f"{prefix}.{name}.{i}")}
            for j, i in enumerate((0, 2))}
        p[f"TorchDense_{h}"] = {"Dense_0": _dense_from_linear(sd, f"{prefix}.{name}.4")}
    return p


def _heavy_estimator(sd: _SD, prefix: str) -> dict:
    """``PoseSizeEstimator`` (modules.py:155-219) -> ``HeavyEstimator``."""
    return {
        "MLP_0": _seq_mlp(sd, prefix + ".pts_mlp1", (0, 2)),
        "MLP_1": _seq_mlp(sd, prefix + ".pts_mlp2", (0, 2)),
        "MLP_2": _seq_mlp(sd, prefix + ".pose_mlp1", (0, 2)),
        "MLP_3": _seq_mlp(sd, prefix + ".pose_mlp2", (0, 2)),
        "PoseHeads_0": _pose_heads(sd, prefix),
    }


def _light_estimator(sd: _SD, prefix: str) -> dict:
    """``LightEstimator`` (ist_net.py:202-264) -> flax LightEstimator."""
    return {
        "MLP_0": _seq_mlp(sd, prefix + ".pts_mlp", (0, 2)),
        "MLP_1": _seq_mlp(sd, prefix + ".pose_mlp1", (0, 2)),
        "MLP_2": _seq_mlp(sd, prefix + ".pose_mlp2", (0, 2)),
        "PoseHeads_0": _pose_heads(sd, prefix),
    }


def _deformer(sd: _SD, prefix: str) -> dict:
    """``FeatureDeformer`` (ist_net.py:125-183) -> flax FeatureDeformer."""
    pre = prefix + ".feature_refine"
    return {"FeatureDeformer_0": {
        "MLP_0": _seq_mlp(sd, pre + ".pts_mlp1", (0, 2)),
        "MLP_1": _seq_mlp(sd, pre + ".deform_mlp1", (0, 2)),
        "MLP_2": _seq_mlp(sd, pre + ".deform_mlp2", (0, 2, 4)),
        "MLP_3": _seq_mlp(sd, pre + ".pred_nocs", (0, 2)),
        "TorchDense_0": {"Dense_0": _dense_from_conv1d(sd, pre + ".pred_nocs.4")},
    }}


# --- models ------------------------------------------------------------------

def convert_state_dict(np_sd: dict, model: str = "ist_net") -> dict:
    """torch state dict (numpy values) -> ``{"params": …, "batch_stats": …}``.

    Raises ``ConversionError`` if any torch key is left unconsumed or missing
    — a silent partial load is exactly the bug class this guards against.
    """
    sd = _SD(np_sd)
    params: dict = {}
    stats: dict = {}

    def put(name: str, trees: tuple[dict, dict]):
        params[name] = trees[0]
        stats[name] = trees[1]

    if model == "ist_net":
        put("rgb_cam_extractor", _encoder(sd, "rgb_cam_extractor"))
        put("pts_cam_extractor", _pointnet2(sd, "pts_cam_extractor"))
        params["implicit_transform"] = _deformer(sd, "implicit_transform")
        params["main_estimator"] = _heavy_estimator(sd, "main_estimator")
        params["cam_enhancer"] = _light_estimator(sd, "cam_enhancer")
        we_p, we_s = _pointnet2(sd, "world_enhancer.extractor")
        params["world_enhancer"] = {"extractor": we_p}
        stats["world_enhancer"] = {"extractor": we_s}
        if sd.has("world_enhancer.pose_estimator.pts_mlp1.0.weight"):
            # absent in freeze_world_enhancer checkpoints (train.py:103-118
            # strips the head before phase 2)
            params["world_enhancer"]["pose_estimator"] = _heavy_estimator(
                sd, "world_enhancer.pose_estimator")
    elif model == "posenet_gt":
        put("rgb_extractor", _encoder(sd, "rgb_extractor"))
        put("pts_extractor", _pointnet2(sd, "pts_extractor"))
        put("pts_gt_extractor", _pointnet2(sd, "pts_gt_extractor"))
        params["pose_estimator_aux"] = _heavy_estimator(sd, "pose_estimator_aux")
    else:
        raise ConversionError(f"unknown model {model!r}")

    sd.drop_matching(r"num_batches_tracked$")
    left = sd.leftovers()
    if left:
        raise ConversionError(
            f"{len(left)} torch keys not mapped (first 10): {left[:10]}")

    f32 = lambda t: _tree_map_np(t)
    return {"params": f32(params), "batch_stats": f32(stats)}


def _tree_map_np(tree):
    if isinstance(tree, dict):
        return {k: _tree_map_np(v) for k, v in tree.items()}
    return np.asarray(tree, np.float32)


def load_torch_state_dict(path: str) -> dict:
    """Load a ``.pth``, unwrap solver containers, strip DataParallel prefixes."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model", "model_state_dict", "net"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    if not isinstance(obj, dict):
        raise ConversionError(f"unrecognized checkpoint container in {path}")
    out = {}
    for k, v in obj.items():
        k = k.removeprefix("module.")
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def convert_file(torch_ckpt: str, model: str = "ist_net") -> dict:
    return convert_state_dict(load_torch_state_dict(torch_ckpt), model)


def save_npz(trees: dict, path: str) -> None:
    np.savez(path, params=trees["params"], batch_stats=trees["batch_stats"])


def load_npz(path: str) -> dict:
    data = np.load(path, allow_pickle=True)
    return {"params": data["params"].item(),
            "batch_stats": data["batch_stats"].item()}


# --- reverse direction: flax trees -> torch state_dict -----------------------
# Lets TPU-trained checkpoints run in the reference's own torch eval stack
# (and round-trips as a second proof of the mapping). Implemented as the
# exact inverse of the forward tables: convert an "address book" state dict
# whose leaves are key names, then invert the resulting tree.

def export_state_dict(trees: dict, model: str = "ist_net") -> dict:
    """``{"params": …, "batch_stats": …}`` -> torch-layout numpy state dict.

    Inverse of :func:`convert_state_dict` (same module tables — the forward
    converter is run once on a shape template to recover the key
    correspondence, so the two directions cannot drift apart).
    ``num_batches_tracked`` buffers are emitted as 0 (torch only reads them
    for momentum=None averaging, which the reference never uses). SharedMLP
    dense biases (absent in torch, zero by convention) are validated zero.
    """
    import json
    import os

    man_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "tests", "data",
        "ref_torch_keys.json")
    with open(man_path) as f:
        manifest = json.load(f)[model]

    present = {k: s for k, s in manifest.items()
               if _key_present(k, model, trees)}

    # leaf-position correspondence: re-run the converter with each torch
    # tensor replaced by a unique id; the id landing at a flax leaf tells us
    # its source key. Layout transforms are then inverted per leaf kind.
    ids = {}
    id_sd = {}
    for i, (k, shape) in enumerate(sorted(present.items())):
        ids[float(i + 1)] = k
        id_sd[k] = np.full(shape, i + 1, np.float32)
    id_trees = convert_state_dict(id_sd, model)

    out: dict[str, np.ndarray] = {}
    pending_bias: dict[str, np.ndarray] = {}  # batch_stats path -> bias
    for coll in ("params", "batch_stats"):
        id_flat = _flatten(id_trees[coll])
        have = _flatten(trees[coll])
        for path, idval in id_flat.items():
            val = np.asarray(have[path], np.float32)
            uid = float(np.ravel(idval)[0])
            if uid == 0.0:
                # SharedMLP dense bias: torch's conv is bias-free (BN absorbs
                # it). A natively-trained nonzero bias folds EXACTLY into the
                # BN running mean at eval: BN(y + b) == BN'(y) with
                # mean' = mean - b.
                bn_path = re.sub(r"TorchDense_(\d+)/Dense_0/bias$",
                                 r"BatchNorm_\1/mean", path)
                if bn_path == path:
                    raise ConversionError(
                        f"{path} has no torch counterpart and no BN to fold into")
                pending_bias[bn_path] = val
                continue
            key = ids[uid]
            shape = tuple(manifest[key])
            out[key] = _untransform(val, shape, key, path)
    id_stats = _flatten(id_trees["batch_stats"])
    for bn_path, bias in pending_bias.items():
        key = ids[float(np.ravel(id_stats[bn_path])[0])]
        out[key] = out[key] - bias
    for k, shape in present.items():
        if k.endswith("num_batches_tracked"):
            out[k] = np.zeros(shape, np.int64)
        elif re.search(r"\.feats\.fc\.(weight|bias)$", k):
            # the reference trunk's fc is dead weight (resnet.py forward
            # returns features only; its fc call is commented out) — the flax
            # side carries nothing; emit zeros so strict torch loads succeed
            out[k] = np.zeros(shape, np.float32)
    missing = [k for k in present if k not in out]
    if missing:
        raise ConversionError(f"export missed {len(missing)} keys: {missing[:5]}")
    return out


def _key_present(key: str, model: str, trees: dict) -> bool:
    """freeze checkpoints carry no world pose head."""
    if model == "ist_net" and key.startswith("world_enhancer.pose_estimator."):
        return "pose_estimator" in trees["params"].get("world_enhancer", {})
    return True


def _untransform(val: np.ndarray, torch_shape: tuple, key: str,
                 flax_path: str) -> np.ndarray:
    """Invert the layout transform that produced this flax leaf (keyed on
    the TORCH rank — shape equality is ambiguous for square matrices)."""
    if len(torch_shape) <= 1:  # BN vectors, biases, PReLU
        out = val
    elif len(torch_shape) == 2:  # linear: (I, O) -> (O, I)
        out = np.transpose(val, (1, 0))
    elif len(torch_shape) == 3:  # conv1d: (I, O) -> (O, I, 1)
        out = np.transpose(val, (1, 0))[:, :, None]
    elif val.ndim == 2:          # dense from 1x1 conv2d: (I, O) -> (O, I, 1, 1)
        out = np.transpose(val, (1, 0))[:, :, None, None]
    else:                        # conv2d kernel HWIO -> OIHW
        out = np.transpose(val, (3, 2, 0, 1))
    if out.shape != torch_shape:
        raise ConversionError(f"cannot invert {flax_path} -> {key}: "
                              f"{val.shape} vs {torch_shape}")
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--torch_ckpt", default=None,
                   help="torch .pth to convert INTO flax trees")
    p.add_argument("--export_npz", default=None,
                   help="converted .npz (or checkpoint payload) to export "
                        "BACK to a torch state_dict .pth")
    p.add_argument("--model", default="ist_net",
                   choices=["ist_net", "posenet_gt"])
    p.add_argument("--out", default=None)
    args = p.parse_args()
    if (args.torch_ckpt is None) == (args.export_npz is None):
        p.error("pass exactly one of --torch_ckpt / --export_npz")
    if args.torch_ckpt:
        trees = convert_file(args.torch_ckpt, args.model)
        out = args.out or args.torch_ckpt.rsplit(".", 1)[0] + "_tpu.npz"
        save_npz(trees, out)
        nleaves = (len(_flatten(trees["params"]))
                   + len(_flatten(trees["batch_stats"])))
        print(f"wrote {out} ({nleaves} leaves)")
    else:
        import torch
        sd = export_state_dict(load_npz(args.export_npz), args.model)
        out = args.out or args.export_npz.rsplit(".", 1)[0] + "_torch.pth"
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, out)
        print(f"wrote {out} ({len(sd)} tensors)")


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


if __name__ == "__main__":
    main()
