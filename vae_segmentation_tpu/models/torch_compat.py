"""Reference (PyTorch) checkpoint conversion.

Converts state_dicts saved by the reference trainers (torch.save of
{'model_state_dict': ...}, main_source.py:826-843) into this framework's
flax param trees, so NIH/MSD checkpoints trained with the reference can be
evaluated and adapted here directly.

Key structure mapping (reference joint_model.py vs our models/*):

  torch                                  flax (ours)
  ------------------------------------   --------------------------------
  in_block.conv.0.{weight,bias}          in_block/Conv3_0/{kernel,bias}
  downK.conv.0.*        (strided conv)   downK/Conv3_0/*
  downK.conv.1.conv.{0,3,6}.*            downK/DoubleConv_0/Conv3_{0,1,2}/*
  upK.conv.0.*          (ConvTranspose)  upK/TConv2_0/*
  upK.conv.1.conv.{0,3,6}.*              upK/DoubleConv_0/Conv3_{0,1,2}/*
  out_block.* (bare Conv3d in Seg/VAE)   out_block/Conv3_0/*
  fc_mean / fc_std / fc2 / fc1           same name, kernel transposed

Weight layout transforms:
  * Conv3d  [O, I, kd, kh, kw]       -> [kd, kh, kw, I, O]
  * ConvT3d [I, O, kd, kh, kw]       -> [kd, kh, kw, I, O]  (flax
    ConvTranspose with transpose_kernel=False matches torch's semantics up
    to this axis order — validated numerically in tests/test_torch_compat.py)
  * Linear  [O, I]                   -> [I, O]
  * bottleneck Linears additionally permute the 16384-wide axis from
    torch's channel-major flatten (C, d, h, w) to our spatial-major
    (d, h, w, C) flatten (models/vae.py encode/decode reshape).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

BOTTLENECK_SIDE = 4  # 128^3 / 2^5 stages
BOTTLENECK_CH = 256


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def _convt_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d [I, O, k...] -> flax [k..., I, O] with the
    spatial taps flipped: flax's ConvTranspose (transpose_kernel=False) is a
    fractionally-strided conv with an UNflipped kernel, while torch's is the
    true conv gradient — the flip reconciles them (verified numerically in
    tests/test_torch_compat.py)."""
    w = np.transpose(w, (2, 3, 4, 0, 1))
    return np.ascontiguousarray(w[::-1, ::-1, ::-1])


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _permute_bottleneck_in(w_t: np.ndarray, ch: int, side: int) -> np.ndarray:
    """[O, ch*side^3] torch (C-major flatten) -> input perm to spatial-major;
    returns still [O, in]."""
    o = w_t.shape[0]
    w = w_t.reshape(o, ch, side, side, side)
    w = np.transpose(w, (0, 2, 3, 4, 1))
    return w.reshape(o, -1)


def _permute_bottleneck_out(w_t: np.ndarray, ch: int, side: int) -> np.ndarray:
    """[ch*side^3, I] torch rows in C-major order -> spatial-major rows."""
    i = w_t.shape[1]
    w = w_t.reshape(ch, side, side, side, i)
    w = np.transpose(w, (1, 2, 3, 0, 4))
    return w.reshape(-1, i)


def _bottleneck_geometry(n: int) -> Tuple[int, int]:
    """bottleneck width -> (channels, side). 16384 -> (256, 4)."""
    ch = BOTTLENECK_CH
    side = round((n // ch) ** (1.0 / 3.0))
    assert ch * side ** 3 == n, n
    return ch, side


_DOUBLECONV_IDX = {0: "0", 1: "3", 2: "6"}


def _torch_key(path: Tuple[str, ...], bare_out_block: bool) -> str:
    """flax param path -> torch state_dict key (without 'weight'/'bias')."""
    parts = list(path)
    name = parts[0]
    if name in ("fc_mean", "fc_std", "fc1", "fc2"):
        return name
    if name == "out_block":
        if bare_out_block:
            return "out_block"
        return "out_block.conv.0"
    if parts[1] in ("ConvTranspose_0", "TConv2_0"):
        return f"{name}.conv.0"
    if parts[1] == "Conv3_0" and len(parts) == 2:
        # in_block/merge (Conv module) or the strided conv of a Down
        return f"{name}.conv.0"
    if parts[1] == "DoubleConv_0":
        i = int(re.match(r"Conv3_(\d)", parts[2]).group(1))
        return f"{name}.conv.1.conv.{_DOUBLECONV_IDX[i]}"
    raise KeyError(f"no torch mapping for flax path {path}")


def convert_component(state_dict: Dict[str, Any], template: Dict,
                      *, bare_out_block: bool = True,
                      bottleneck_fcs: Tuple[str, ...] = ()) -> Dict:
    """torch state_dict of ONE reference module -> flax params matching
    `template`'s tree structure and shapes.

    bare_out_block: reference Seg/VAE have out_block as a bare Conv3d.
    bottleneck_fcs: names whose 16384-wide axis needs the flatten-order
    permutation ('fc_mean', 'fc_std' input side; 'fc2' output side; 'fc1'
    input side for Encoder).
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(template)[0]
    out: Dict = jax.tree_util.tree_map(lambda x: None, template)

    def assign(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = val

    out = jax.tree_util.tree_map(lambda x: x, template)
    for keypath, leaf in flat:
        path = tuple(k.key for k in keypath)
        tkey = _torch_key(path[:-1], bare_out_block)
        kind = path[-1]  # kernel | bias
        tname = f"{tkey}.weight" if kind == "kernel" else f"{tkey}.bias"
        w = np.asarray(state_dict[tname], dtype=np.float32)
        base = path[0]
        if kind == "kernel":
            if w.ndim == 5 and path[-2] in ("ConvTranspose_0", "TConv2_0"):
                w = _convt_kernel(w)
            elif w.ndim == 5:
                w = _conv_kernel(w)
            else:
                if base in bottleneck_fcs and base != "fc2":
                    ch, side = _bottleneck_geometry(w.shape[1])
                    w = _permute_bottleneck_in(w, ch, side)
                if base == "fc2" and base in bottleneck_fcs:
                    ch, side = _bottleneck_geometry(w.shape[0])
                    w = _permute_bottleneck_out(w, ch, side)
                w = _dense_kernel(w)
        else:
            if base == "fc2" and base in bottleneck_fcs:
                ch, side = _bottleneck_geometry(w.shape[0])
                w = w.reshape(ch, side, side, side)
                w = np.transpose(w, (1, 2, 3, 0)).reshape(-1)
        assert w.shape == leaf.shape, (path, w.shape, leaf.shape)
        assign(out, path, w.astype(np.asarray(leaf).dtype))
    return out


def _strip_prefix(state_dict: Dict, prefix: str) -> Dict:
    plen = len(prefix)
    return {k[plen:]: v for k, v in state_dict.items() if k.startswith(prefix)}


VAE_FCS = ("fc_mean", "fc_std", "fc2")
ENCODER_FCS = ("fc1",)


def convert_state_dict(state_dict: Dict, template: Dict,
                       kind: str) -> Dict:
    """kind: 'vae' | 'seg' | 'encoder' | 'fusion' | 'joint' | 'joint2' |
    'embed'. Composite kinds recurse per submodule prefix."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in state_dict.items()}
    if kind == "vae":
        return convert_component(sd, template, bare_out_block=True,
                                 bottleneck_fcs=VAE_FCS)
    if kind == "seg":
        return convert_component(sd, template, bare_out_block=True)
    if kind == "encoder":
        return convert_component(sd, template, bare_out_block=True,
                                 bottleneck_fcs=ENCODER_FCS)
    if kind == "fusion":
        return convert_component(sd, template, bare_out_block=True)
    if kind == "joint":
        return {
            "Seg": convert_state_dict(_strip_prefix(sd, "Seg."),
                                      template["Seg"], "seg"),
            "Vae": convert_state_dict(_strip_prefix(sd, "Vae."),
                                      template["Vae"], "vae"),
        }
    if kind == "joint2":
        return {
            "Seg": convert_state_dict(_strip_prefix(sd, "Seg."),
                                      template["Seg"], "seg"),
            "Dis": convert_state_dict(_strip_prefix(sd, "Dis."),
                                      template["Dis"], "encoder"),
        }
    if kind == "embed":
        return {
            "Encoder": convert_state_dict(_strip_prefix(sd, "Encoder."),
                                          template["Encoder"], "encoder"),
            "Vae": convert_state_dict(_strip_prefix(sd, "Vae."),
                                      template["Vae"], "vae"),
            "Fusion": convert_state_dict(_strip_prefix(sd, "Fusion."),
                                         template["Fusion"], "fusion"),
        }
    raise ValueError(kind)


def load_torch_checkpoint(path: str, template: Dict, kind: str) -> Dict:
    """Load a reference .ckpt (torch.save) and convert its model_state_dict."""
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = ck.get("model_state_dict", ck)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_state_dict(sd, template, kind)
