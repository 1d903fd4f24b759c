"""Import torchvision ResNet-34 weights into the flax ResNet34Encoder.

The reference initializes its RGB encoder from torchvision's pretrained
resnet34 and copies conv1's 7x7 kernels into the stride-1 stem
(``/root/reference/experiments_*/rgbd_rgbxyz_sigmoid_for_rgb/2d_net/backbones.py:20-27``).
This module performs the same import for the TPU build: a torch
``state_dict`` (loaded on CPU, converted to numpy) is mapped onto the
`models.resnet2d.ResNet34Encoder` parameter / batch-stats trees.

Layout notes: torch convs are OIHW, flax convs are HWIO -> transpose
(2, 3, 1, 0).  BatchNorm weight/bias -> scale/bias; running stats -> the
'batch_stats' collection.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

STAGE_SIZES = (3, 4, 6, 3)


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0)).astype(np.float32)


def resnet34_state_dict_to_flax(
    sd: Mapping[str, np.ndarray],
) -> Tuple[Dict, Dict]:
    """Convert a torchvision resnet34 state_dict (numpy values) into
    (params, batch_stats) subtrees for ResNet34Encoder."""

    def bn(prefix):
        p = {
            "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
        }
        s = {
            "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
            "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
        }
        return p, s

    params: Dict = {}
    stats: Dict = {}

    stem_bn_p, stem_bn_s = bn("bn1")
    params["stem"] = {"conv": {"kernel": _conv(sd["conv1.weight"])}, "bn": stem_bn_p}
    stats["stem"] = {"bn": stem_bn_s}

    for i, blocks in enumerate(STAGE_SIZES, start=1):
        for b in range(blocks):
            t = f"layer{i}.{b}"
            name = f"layer{i}_{b}"
            bn1_p, bn1_s = bn(f"{t}.bn1")
            bn2_p, bn2_s = bn(f"{t}.bn2")
            params[name] = {
                "cb1": {"conv": {"kernel": _conv(sd[f"{t}.conv1.weight"])}, "bn": bn1_p},
                "cb2": {"conv": {"kernel": _conv(sd[f"{t}.conv2.weight"])}, "bn": bn2_p},
            }
            stats[name] = {"cb1": {"bn": bn1_s}, "cb2": {"bn": bn2_s}}
            if f"{t}.downsample.0.weight" in sd:
                dbn_p, dbn_s = bn(f"{t}.downsample.1")
                params[name]["downsample"] = {
                    "conv": {"kernel": _conv(sd[f"{t}.downsample.0.weight"])},
                    "bn": dbn_p,
                }
                stats[name]["downsample"] = {"bn": dbn_s}

    return params, stats


def _tconv(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (Cin, Cout, kh, kw) -> flax ConvTranspose
    (kh, kw, Cin, Cout) with the spatial flip flax's non-transposed kernel
    convention requires (verified numerically against torch)."""
    return np.ascontiguousarray(
        np.transpose(np.asarray(w), (2, 3, 0, 1))[::-1, ::-1]
    ).astype(np.float32)


def net2dseg_state_dict_to_flax(sd: Mapping[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Convert a FULL reference Net2DSeg state_dict into (params,
    batch_stats) for `models.net2d.Net2DSeg`.

    Covers both backbones (stems hoisted to the fused dual-stem layout),
    the 4 up/fuse decoder stages, dec_conv_stage1, and the two pooled heads
    (``2d_net/model.py:35-180``).  The reference aux module's unused
    ``linear`` layer is skipped.
    """

    def bn(prefix):
        return (
            {
                "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
                "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
            },
            {
                "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
                "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
            },
        )

    params: Dict = {}
    stats: Dict = {}

    for torch_name, stem_name in (
        ("rgb_backbone", "stem_rgb"), ("depth_backbone", "stem_depth"),
    ):
        sub = {
            k[len(torch_name) + 1:]: v
            for k, v in sd.items()
            if k.startswith(torch_name + ".")
        }
        # reference Backbone wraps the torchvision net as .encoder
        sub = {
            (k[len("encoder."):] if k.startswith("encoder.") else k): v
            for k, v in sub.items()
        }
        p, s = resnet34_state_dict_to_flax(sub)
        params[stem_name] = p.pop("stem")
        stats[stem_name] = s.pop("stem")
        params[torch_name] = p
        stats[torch_name] = s

    # decoder: dec_t_conv_stage{5,4,3,2} -> up{5,4,3,2};
    # dec_conv_stage{4,3,2} -> fuse{4,3,2}
    for t_name, f_name in (
        ("dec_t_conv_stage5", "up5"), ("dec_t_conv_stage4", "up4"),
        ("dec_t_conv_stage3", "up3"), ("dec_t_conv_stage2", "up2"),
    ):
        bn_p, bn_s = bn(f"{t_name}.1")
        params[f_name] = {
            "tconv": {
                "kernel": _tconv(sd[f"{t_name}.0.weight"]),
                "bias": np.asarray(sd[f"{t_name}.0.bias"], np.float32),
            },
            "bn": bn_p,
        }
        stats[f_name] = {"bn": bn_s}
    for t_name, f_name in (
        ("dec_conv_stage4", "fuse4"), ("dec_conv_stage3", "fuse3"),
        ("dec_conv_stage2", "fuse2"),
    ):
        bn_p, bn_s = bn(f"{t_name}.1")
        params[f_name] = {
            "conv": {
                "kernel": _conv(sd[f"{t_name}.0.weight"]),
                "bias": np.asarray(sd[f"{t_name}.0.bias"], np.float32),
            },
            "bn": bn_p,
        }
        stats[f_name] = {"bn": bn_s}

    params["dec_conv_stage1"] = {
        "kernel": _conv(sd["dec_conv_stage1.weight"]),
        "bias": np.asarray(sd["dec_conv_stage1.bias"], np.float32),
    }
    params["head_conv"] = {
        "kernel": _conv(sd["con1_1_avg.weight"]),
        "bias": np.asarray(sd["con1_1_avg.bias"], np.float32),
    }
    params["aux_conv"] = {
        "kernel": _conv(sd["aux.con1_1_avg.weight"]),
        "bias": np.asarray(sd["aux.con1_1_avg.bias"], np.float32),
    }
    return params, stats


def load_pretrained_backbone(checkpoint_path: str) -> Tuple[Dict, Dict]:
    """Load a torchvision resnet34 checkpoint (.pth) from disk and convert.

    Offline-friendly: expects a local file (no download).
    """
    import torch  # CPU-only usage

    sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd_np = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return resnet34_state_dict_to_flax(sd_np)


def graft_backbone(variables: Dict, backbone_name: str, params: Dict, stats: Dict) -> Dict:
    """Return a copy of a Net2DSeg variables pytree with `backbone_name`
    (e.g. "rgb_backbone") replaced by the imported weights.

    Net2DSeg hoists the stem into its fused dual-stem module: the imported
    "stem" subtree lands at "stem_rgb" / "stem_depth" alongside the trunk.
    """
    import jax

    params, stats = dict(params), dict(stats)
    stem_name = {"rgb_backbone": "stem_rgb", "depth_backbone": "stem_depth"}[
        backbone_name
    ]
    stem_p = params.pop("stem")
    stem_s = stats.pop("stem")

    new_vars = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    new_vars = dict(new_vars)
    new_vars["params"] = dict(new_vars["params"])
    new_vars["params"][backbone_name] = params
    new_vars["params"][stem_name] = stem_p
    new_vars["batch_stats"] = dict(new_vars.get("batch_stats", {}))
    new_vars["batch_stats"][backbone_name] = stats
    new_vars["batch_stats"][stem_name] = stem_s
    return new_vars
