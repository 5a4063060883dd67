"""Export Flax parameter trees as reference-format PyTorch state dicts.

The exact inverse of ``models/torch_import.py``: a checkpoint trained in
this framework becomes a ``.pth`` state dict whose key names and tensor
layouts match the reference networks (Model/CycleGan.py:23-103,
Model/HdGan.py:148-205, trainer/reg.py:31-132), so reference users can
take a TPU-trained model back into their existing PyTorch evaluation and
deployment stacks. Round-trip identity with the import maps is locked by
tests/test_torch_import.py.

Layout conversions (inverse of torch_import):
- flax Conv kernel (kh, kw, I, O)           -> Conv2d weight (O, I, kh, kw)
- flax ConvTranspose (transpose_kernel=True)
  kernel (kh, kw, O, I)                     -> ConvTranspose2d (I, O, kh, kw)
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ctagan_tpu.models.reg import NDF, NUF


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _conv(sd: Dict[str, np.ndarray], key: str, sub: Dict[str, Any]) -> None:
    p = sub["Conv_0"]
    sd[f"{key}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        sd[f"{key}.bias"] = _np(p["bias"])


def _convt(sd: Dict[str, np.ndarray], key: str, sub: Dict[str, Any]) -> None:
    p = sub["ConvTranspose_0"]
    # (kh, kw, O, I) -> (I, O, kh, kw)
    sd[f"{key}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        sd[f"{key}.bias"] = _np(p["bias"])


def generator_state_dict(tree) -> Dict[str, np.ndarray]:
    """models.Generator params -> reference Generator state dict
    (Model/CycleGan.py:23-71 ``model_head``/``model_body``/``model_tail``
    Sequential key names)."""
    params = tree["params"] if "params" in tree else tree
    sd: Dict[str, np.ndarray] = {}
    _conv(sd, "model_head.1", params["ConvTorch_0"])
    _conv(sd, "model_head.4", params["ConvTorch_1"])
    _conv(sd, "model_head.7", params["ConvTorch_2"])
    blocks = sorted(
        int(k.split("_")[1])
        for k in params
        if k.startswith("ResidualBlock_")
    )
    for b in blocks:
        blk = params[f"ResidualBlock_{b}"]
        _conv(sd, f"model_body.{b}.conv_block.1", blk["ConvTorch_0"])
        _conv(sd, f"model_body.{b}.conv_block.5", blk["ConvTorch_1"])
    _convt(sd, "model_tail.0", params["ConvTransposeTorch_0"])
    _convt(sd, "model_tail.3", params["ConvTransposeTorch_1"])
    _conv(sd, "model_tail.7", params["ConvTorch_3"])
    return sd


def discriminator_state_dict(tree) -> Dict[str, np.ndarray]:
    """models.Discriminator params -> reference scalar-PatchGAN state dict
    (Model/CycleGan.py:73-103 ``model.{0,2,5,8,11}``)."""
    params = tree["params"] if "params" in tree else tree
    sd: Dict[str, np.ndarray] = {}
    for i, idx in enumerate((0, 2, 5, 8, 11)):
        _conv(sd, f"model.{idx}", params[f"ConvTorch_{i}"])
    return sd


def nlayer_discriminator_state_dict(
    tree, n_layers: int = 3
) -> Dict[str, np.ndarray]:
    """models.NLayerDiscriminator params -> reference getIntermFeat layout
    (HdGan.py:148-205 ``model{n}.0``)."""
    params = tree["params"] if "params" in tree else tree
    sd: Dict[str, np.ndarray] = {}
    for n in range(n_layers + 2):
        _conv(sd, f"model{n}.0", params[f"ConvTorch_{n}"])
    return sd


def _resnet_block(sd, prefix, sub) -> None:
    _conv(sd, f"{prefix}.conv_block.1", sub["ConvTorch_0"])
    _conv(sd, f"{prefix}.conv_block.5", sub["ConvTorch_1"])


def regnet_state_dict(tree) -> Dict[str, np.ndarray]:
    """models.RegNet params -> reference Reg state dict (reg.py:101-132
    ``offset_map.*`` key names)."""
    params = tree["params"] if "params" in tree else tree
    sd: Dict[str, np.ndarray] = {}
    for i in range(len(NDF)):
        sub = params[f"down_{i + 1}"]
        _conv(sd, f"offset_map.down_{i + 1}.conv_0.conv2d", sub["ConvTorch_0"])
        _resnet_block(
            sd,
            f"offset_map.down_{i + 1}.conv_0.resnet_block.model.0",
            sub["RegResnetBlock_0"],
        )
    _conv(sd, "offset_map.c1.conv2d", params["c1"]["ConvTorch_0"])
    for j in range(3):
        _resnet_block(sd, f"offset_map.t.model.{j}", params[f"t_{j}"])
    _conv(sd, "offset_map.c2.conv2d", params["c2"]["ConvTorch_0"])
    for i in range(len(NUF)):
        conv_num = len(NDF) - i
        _conv(
            sd,
            f"offset_map.up_{conv_num}.conv2d",
            params[f"up_{conv_num}"]["ConvTorch_0"],
        )
    _resnet_block(sd, "offset_map.refine.0.model.0", params["refine_res"])
    _conv(sd, "offset_map.refine.1.conv2d",
          params["refine_conv"]["ConvTorch_0"])
    _conv(sd, "offset_map.output.conv2d", params["output"]["ConvTorch_0"])
    return sd


def save_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    """Write a state dict as a ``.pth`` the reference can ``torch.load``
    (tensors, not numpy arrays — their scripts call ``.cuda()`` on them)."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
