"""PyTorch checkpoint → flax parameter conversion.

Enables loading the reference's released pose-model checkpoints
(torch.save({'state_dict': ...}), ref: cosypose/training/train_pose.py:54-61)
into this framework's PoseNet for checkpoint-parity evaluation (SURVEY.md §7.2
step 3 acceptance). The layer mapping follows the reference's vendored
EfficientNet-PyTorch module names (ref: cosypose/models/efficientnet.py:
_conv_stem/_bn0, _blocks.N.{_expand_conv,_depthwise_conv,_se_reduce,_se_expand,
_project_conv,_bn0,_bn1,_bn2}, _conv_head/_bn1) and the pose head
(ref: cosypose/models/pose.py:32 pose_fc).
"""

from __future__ import annotations

import numpy as np

from ..models.efficientnet import (
    EFFICIENTNET_PARAMS,
    _BASE_BLOCKS,
    round_repeats,
)


def _conv_kernel(w) -> np.ndarray:
    """torch conv weight (O, I, kh, kw) → flax kernel (kh, kw, I, O)."""
    return np.asarray(w).transpose(2, 3, 1, 0)


def _block_name_map(variant: str):
    """flat torch block index → (stage, repeat) flax block name."""
    _, d_mult, _, _ = EFFICIENTNET_PARAMS[variant]
    names = []
    for stage, (repeat, *_rest) in enumerate(_BASE_BLOCKS):
        for i in range(round_repeats(repeat, d_mult)):
            names.append(f"block{stage}_{i}")
    return names


def convert_efficientnet_state_dict(state_dict, variant: str = "efficientnet-b3"):
    """→ (params, batch_stats) pytrees for models.efficientnet.EfficientNet."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")}
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def bn(torch_prefix, flax_name):
        put(params, (flax_name, "scale"), sd[f"{torch_prefix}.weight"])
        put(params, (flax_name, "bias"), sd[f"{torch_prefix}.bias"])
        put(stats, (flax_name, "mean"), sd[f"{torch_prefix}.running_mean"])
        put(stats, (flax_name, "var"), sd[f"{torch_prefix}.running_var"])

    put(params, ("stem_conv", "kernel"), _conv_kernel(sd["_conv_stem.weight"]))
    bn("_bn0", "stem_bn")

    def bn_into(torch_prefix, block, flax_name):
        params[block][flax_name] = dict(
            scale=sd[f"{torch_prefix}.weight"], bias=sd[f"{torch_prefix}.bias"]
        )
        stats.setdefault(block, {})[flax_name] = dict(
            mean=sd[f"{torch_prefix}.running_mean"],
            var=sd[f"{torch_prefix}.running_var"],
        )

    for idx, name in enumerate(_block_name_map(variant)):
        tp = f"_blocks.{idx}"
        params[name] = {}
        if f"{tp}._expand_conv.weight" in sd:
            params[name]["expand_conv"] = dict(
                kernel=_conv_kernel(sd[f"{tp}._expand_conv.weight"])
            )
            bn_into(f"{tp}._bn0", name, "bn0")
        params[name]["dw_conv"] = dict(
            kernel=_conv_kernel(sd[f"{tp}._depthwise_conv.weight"])
        )
        bn_into(f"{tp}._bn1", name, "bn1")
        params[name]["se"] = dict(
            reduce=dict(
                kernel=_conv_kernel(sd[f"{tp}._se_reduce.weight"]),
                bias=sd[f"{tp}._se_reduce.bias"],
            ),
            expand=dict(
                kernel=_conv_kernel(sd[f"{tp}._se_expand.weight"]),
                bias=sd[f"{tp}._se_expand.bias"],
            ),
        )
        params[name]["project_conv"] = dict(
            kernel=_conv_kernel(sd[f"{tp}._project_conv.weight"])
        )
        bn_into(f"{tp}._bn2", name, "bn2")

    params["head_conv"] = dict(kernel=_conv_kernel(sd["_conv_head.weight"]))
    params["head_bn"] = dict(scale=sd["_bn1.weight"], bias=sd["_bn1.bias"])
    stats["head_bn"] = dict(mean=sd["_bn1.running_mean"],
                            var=sd["_bn1.running_var"])
    return params, stats


def convert_pose_checkpoint(torch_state_dict, variant: str = "efficientnet-b3"):
    """Full reference PosePredictor state_dict → PoseNet variables.

    The reference prefixes the backbone as 'backbone.' and the head as
    'pose_fc.' (ref: cosypose/models/pose.py:24-33); DDP checkpoints may add a
    'module.' prefix.
    """
    sd = {}
    for k, v in torch_state_dict.items():
        k = k.removeprefix("module.")
        sd[k] = v
    backbone_sd = {k.removeprefix("backbone."): v for k, v in sd.items()
                   if k.startswith("backbone.")}
    bb_params, bb_stats = convert_efficientnet_state_dict(backbone_sd, variant)
    params = {
        "EfficientNet_0": bb_params,
        "pose_fc": dict(
            kernel=np.asarray(sd["pose_fc.weight"]).T,
            bias=np.asarray(sd["pose_fc.bias"]),
        ),
    }
    batch_stats = {"EfficientNet_0": bb_stats}
    return {"params": params, "batch_stats": batch_stats}


def convert_flownet_state_dict(state_dict):
    """Torch FlowNetS encoder weights → FlowNetSEncoder flax params.

    The reference initializes its FlowNetS ablation backbone from the
    published flownets_EPE1.951.pth.tar checkpoint, keeping only the
    contracting convs (ref: cosypose/models/flownet.py:121-128). Torch
    modules are Sequential(conv, leaky_relu) so weights live at
    '<name>.0.weight'/'<name>.0.bias'.
    """
    names = ["conv1", "conv2", "conv3", "conv3_1", "conv4", "conv4_1",
             "conv5", "conv5_1", "conv6", "conv6_1"]
    params = {}
    for name in names:
        w = state_dict[f"{name}.0.weight"]
        b = state_dict[f"{name}.0.bias"]
        params[name] = dict(
            kernel=_conv_kernel(w),
            bias=np.asarray(b, np.float32),
        )
    return {"params": params}
