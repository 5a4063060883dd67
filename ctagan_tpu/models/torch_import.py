"""Import reference PyTorch checkpoints into the Flax parameter trees.

The reference ships ``.pth`` state dicts per network (e.g.
``netG_A2B_45_32.6358_0.939.pth``); this module maps their key names onto
this framework's parameter trees so reference-trained weights run natively
on TPU (quality-parity evaluation, SURVEY.md §5 checkpoint/resume notes).

Layout conversions:
- Conv2d weight (O, I, kh, kw)          -> flax Conv kernel (kh, kw, I, O)
- ConvTranspose2d weight (I, O, kh, kw) -> flax ConvTranspose
  (transpose_kernel=True) kernel (kh, kw, O, I)
- biases are 1-D and map unchanged.

Key maps follow the reference's nn.Sequential indices:
- Generator (Model/CycleGan.py:23-71): ``model_head.{1,4,7}``,
  ``model_body.{k}.conv_block.{1,5}``, ``model_tail.{0,3,7}``;
- Discriminator (CycleGan.py:73-103): ``model.{0,2,5,8,11}``;
- NLayerDiscriminator (HdGan.py:148-205): ``model{n}.0`` per stage;
- Reg/ResUnet (reg.py:31-132): ``offset_map.<block>...conv2d`` plus nested
  ResnetBlocks ``...model.{k}.conv_block.{1,5}``.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ctagan_tpu.models.reg import NDF, NUF


def _load_pth(path_or_dict) -> Dict[str, np.ndarray]:
    if isinstance(path_or_dict, dict):
        raw = path_or_dict
    else:
        import torch

        raw = torch.load(path_or_dict, map_location="cpu", weights_only=False)
    out = {}
    for k, v in raw.items():
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


def _conv(sd, key):
    w = sd[f"{key}.weight"].transpose(2, 3, 1, 0)
    p = {"kernel": w}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return {"Conv_0": p}


def _convt(sd, key):
    w = sd[f"{key}.weight"].transpose(2, 3, 1, 0)  # (I,O,kh,kw)->(kh,kw,O,I)
    p = {"kernel": w}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return {"ConvTranspose_0": p}


def import_generator(path_or_dict) -> Dict[str, Any]:
    """Reference Generator state dict -> {'params': ...} for models.Generator."""
    sd = _load_pth(path_or_dict)
    params: Dict[str, Any] = {}
    params["ConvTorch_0"] = _conv(sd, "model_head.1")
    params["ConvTorch_1"] = _conv(sd, "model_head.4")
    params["ConvTorch_2"] = _conv(sd, "model_head.7")
    n_blocks = (
        max(
            int(k.split(".")[1])
            for k in sd
            if k.startswith("model_body.")
        )
        + 1
    )
    for b in range(n_blocks):
        params[f"ResidualBlock_{b}"] = {
            "ConvTorch_0": _conv(sd, f"model_body.{b}.conv_block.1"),
            "ConvTorch_1": _conv(sd, f"model_body.{b}.conv_block.5"),
        }
    params["ConvTransposeTorch_0"] = _convt(sd, "model_tail.0")
    params["ConvTransposeTorch_1"] = _convt(sd, "model_tail.3")
    params["ConvTorch_3"] = _conv(sd, "model_tail.7")
    return {"params": params}


def import_discriminator(path_or_dict) -> Dict[str, Any]:
    """Reference scalar-PatchGAN Discriminator -> models.Discriminator."""
    sd = _load_pth(path_or_dict)
    params = {}
    for i, idx in enumerate((0, 2, 5, 8, 11)):
        params[f"ConvTorch_{i}"] = _conv(sd, f"model.{idx}")
    return {"params": params}


def import_nlayer_discriminator(path_or_dict, n_layers: int = 3) -> Dict[str, Any]:
    """Reference NLayerDiscriminator (getIntermFeat layout: model{n}.0)."""
    sd = _load_pth(path_or_dict)
    params = {}
    for n in range(n_layers + 2):
        params[f"ConvTorch_{n}"] = _conv(sd, f"model{n}.0")
    return {"params": params}


def _resnet_block(sd, prefix):
    return {
        "ConvTorch_0": _conv(sd, f"{prefix}.conv_block.1"),
        "ConvTorch_1": _conv(sd, f"{prefix}.conv_block.5"),
    }


def import_regnet(path_or_dict) -> Dict[str, Any]:
    """Reference Reg (reg.py:101) state dict -> models.RegNet."""
    sd = _load_pth(path_or_dict)
    params: Dict[str, Any] = {}
    for i in range(len(NDF)):
        params[f"down_{i + 1}"] = {
            "ConvTorch_0": _conv(sd, f"offset_map.down_{i + 1}.conv_0.conv2d"),
            "RegResnetBlock_0": _resnet_block(
                sd, f"offset_map.down_{i + 1}.conv_0.resnet_block.model.0"
            ),
        }
    params["c1"] = {"ConvTorch_0": _conv(sd, "offset_map.c1.conv2d")}
    for j in range(3):
        params[f"t_{j}"] = _resnet_block(sd, f"offset_map.t.model.{j}")
    params["c2"] = {"ConvTorch_0": _conv(sd, "offset_map.c2.conv2d")}
    for i in range(len(NUF)):
        conv_num = len(NDF) - i
        params[f"up_{conv_num}"] = {
            "ConvTorch_0": _conv(sd, f"offset_map.up_{conv_num}.conv2d")
        }
    params["refine_res"] = _resnet_block(sd, "offset_map.refine.0.model.0")
    params["refine_conv"] = {
        "ConvTorch_0": _conv(sd, "offset_map.refine.1.conv2d")
    }
    params["output"] = {"ConvTorch_0": _conv(sd, "offset_map.output.conv2d")}
    return {"params": params}
