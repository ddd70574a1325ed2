"""Import reference torch HiFi-GAN checkpoints into flax params.

Converts the reference checkpoint layouts (`vocoders/hifigan.py:17-33`:
yaml-trained `state_dict.model_gen`, or the official hifi-gan
`generator` dict) into the parameter tree of
`bisinger_tpu.models.hifigan.HifiGanGenerator` so reference-trained
vocoders can drive this framework for parity testing.

Conversion rules (validated numerically against torch on CPU — see
tests/test_torch_import.py):

  - Conv1d weight [out, in, k]        -> flax Conv kernel [k, in, out]
  - ConvTranspose1d weight [in,out,k] -> flax ConvTranspose (SAME,
    default transpose_kernel=False) kernel = flip_k then [k, in, out]
  - Linear weight [out, in]           -> flax Dense kernel [in, out]
  - weight-norm checkpoints store weight_g/weight_v; fold them first:
    w = g * v / ||v||_{dims!=0} (reference removes weight norm at
    inference, `modules/hifigan/hifigan.py:175-182`).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def fold_weight_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold `<name>.weight_g` + `<name>.weight_v` -> `<name>.weight`."""
    out: Dict[str, np.ndarray] = {}
    for key, val in sd.items():
        if key.endswith(".weight_v"):
            base = key[: -len(".weight_v")]
            g = np.asarray(sd[base + ".weight_g"], np.float32)
            v = np.asarray(val, np.float32)
            norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
            out[base + ".weight"] = g * v / np.maximum(norm, 1e-12)
        elif key.endswith(".weight_g"):
            continue
        else:
            out[key] = np.asarray(val)
    return out


def _conv(sd, name):
    w = sd[name + ".weight"]  # [out, in, k]
    p = {"kernel": w.transpose(2, 1, 0).copy()}
    if name + ".bias" in sd:
        p["bias"] = sd[name + ".bias"]
    return p


def _conv_transpose(sd, name):
    w = sd[name + ".weight"]  # [in, out, k]
    p = {"kernel": w[:, :, ::-1].transpose(2, 0, 1).copy()}
    if name + ".bias" in sd:
        p["bias"] = sd[name + ".bias"]
    return p


def _dense(sd, name):
    w = sd[name + ".weight"]  # [out, in]
    p = {"kernel": w.transpose(1, 0).copy()}
    if name + ".bias" in sd:
        p["bias"] = sd[name + ".bias"]
    return p


def import_hifigan_generator(state_dict: Dict[str, Any], hp) -> Dict[str, Any]:
    """Torch generator state dict -> flax HifiGanGenerator params."""
    sd = fold_weight_norm(
        {k: np.asarray(v) for k, v in state_dict.items()}
    )
    n_up = len(hp["upsample_rates"])
    n_k = len(hp["resblock_kernel_sizes"])
    n_dil = len(hp["resblock_dilation_sizes"][0])

    params: Dict[str, Any] = {}
    params["conv_pre"] = _conv(sd, "conv_pre")
    params["conv_post"] = _conv(sd, "conv_post")
    for i in range(n_up):
        params[f"up_{i}"] = _conv_transpose(sd, f"ups.{i}")
        for j in range(n_k):
            blk: Dict[str, Any] = {}
            tname = f"resblocks.{i * n_k + j}"
            for d in range(n_dil):
                if f"{tname}.convs1.{d}.weight" in sd:  # ResBlock1
                    blk[f"conv1_{d}"] = _conv(sd, f"{tname}.convs1.{d}")
                    blk[f"conv2_{d}"] = _conv(sd, f"{tname}.convs2.{d}")
                else:  # ResBlock2
                    blk[f"conv_{d}"] = _conv(sd, f"{tname}.convs.{d}")
            params[f"res_{i}_{j}"] = blk
        if f"noise_convs.{i}.weight" in sd:
            params[f"noise_conv_{i}"] = _conv(sd, f"noise_convs.{i}")
            # the reference applies PARAMETERLESS functional layer_norm
            # after the noise conv (`modules/hifigan/hifigan.py:158`);
            # the flax model uses nn.LayerNorm, so synthesize identity
            # scale/bias for it — without these, apply() would fail on
            # imported NSF checkpoints
            c_out = params[f"noise_conv_{i}"]["kernel"].shape[-1]
            params[f"noise_norm_{i}"] = {
                "scale": np.ones(c_out, np.float32),
                "bias": np.zeros(c_out, np.float32),
            }
    if "m_source.l_linear.weight" in sd:
        params["m_source"] = {"merge": _dense(sd, "m_source.l_linear")}
    return jax.tree.map(jnp.asarray, params)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .ckpt/.pt file and return the generator state dict
    (`state_dict.model_gen` or `generator` naming, reference
    `vocoders/hifigan.py:17-33`)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in ckpt and "model_gen" in ckpt["state_dict"]:
        sd = ckpt["state_dict"]["model_gen"]
    elif "generator" in ckpt:
        sd = ckpt["generator"]
    elif "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    else:
        sd = ckpt
    out = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    # lightning-style flat dicts prefix generator keys with 'model_gen.'
    if out and all(k.startswith("model_gen.") for k in out):
        out = {k[len("model_gen."):]: v for k, v in out.items()}
    return out


def import_pwg_generator(state_dict: Dict[str, Any], hp) -> Dict[str, Any]:
    """Torch ParallelWaveGANGenerator state dict -> flax
    `models/pwg.py:ParallelWaveGANGenerator` params (reference layout
    `modules/parallel_wavegan/models/parallel_wavegan.py:18-120`,
    weight norm folded)."""
    sd = fold_weight_norm({k: np.asarray(v) for k, v in state_dict.items()})
    scales = list(hp.get("pwg_upsample_scales", [4, 4, 4, 2]))

    params: Dict[str, Any] = {}
    params["first_conv"] = _conv(sd, "first_conv")
    up: Dict[str, Any] = {"conv_in": _conv(sd, "upsample_net.conv_in")}
    up_net: Dict[str, Any] = {}
    for i in range(len(scales)):
        # up_layers interleave [Stretch2d, Conv2d, ...]: conv at 2i+1;
        # Conv2d weight [1, 1, 1, 2s+1] -> shared time kernel [k, 1, 1]
        w2d = sd[f"upsample_net.upsample.up_layers.{2 * i + 1}.weight"]
        up_net[f"conv_{i}_kernel"] = w2d[0, 0, 0, :].reshape(-1, 1, 1).copy()
    up["upsample"] = up_net
    params["upsample_net"] = up
    n_layers = 0
    while f"conv_layers.{n_layers}.conv.weight" in sd:
        n_layers += 1
    for i in range(n_layers):
        params[f"block_{i}"] = {
            "conv": _conv(sd, f"conv_layers.{i}.conv"),
            "aux_conv": _conv(sd, f"conv_layers.{i}.conv1x1_aux"),
            "skip_conv": _conv(sd, f"conv_layers.{i}.conv1x1_skip"),
            "out_conv": _conv(sd, f"conv_layers.{i}.conv1x1_out"),
        }
    params["post_conv_1"] = _conv(sd, "last_conv_layers.1")
    params["post_conv_2"] = _conv(sd, "last_conv_layers.3")
    return jax.tree_util.tree_map(jnp.asarray, params)


def import_melgan_generator(state_dict: Dict[str, Any], hp) -> Dict[str, Any]:
    """Torch MelGANGenerator state dict -> flax
    `models/melgan.py:MelGanGenerator` params (reference Sequential
    layout `modules/parallel_wavegan/models/melgan.py:17-143`: layer
    index 1 = pre conv; per scale i, 3+5i = transpose conv and
    4+5i+j = residual stack j; 4+5n = post conv; weight norm folded)."""
    sd = fold_weight_norm({k: np.asarray(v) for k, v in state_dict.items()})
    scales = list(hp.get("melgan_upsample_scales", [8, 8, 2, 2]))

    params: Dict[str, Any] = {"conv_pre": _conv(sd, "melgan.1")}
    for i in range(len(scales)):
        params[f"up_{i}"] = _conv_transpose(sd, f"melgan.{3 + 5 * i}")
        res: Dict[str, Any] = {}
        for j in range(3):
            base = f"melgan.{4 + 5 * i + j}"
            res[f"conv_{j}"] = _conv(sd, f"{base}.stack.2")
            res[f"out_{j}"] = _conv(sd, f"{base}.stack.4")
            res[f"skip_{j}"] = _conv(sd, f"{base}.skip_layer")
        params[f"res_{i}"] = res
    params["conv_post"] = _conv(sd, f"melgan.{4 + 5 * len(scales)}")
    return jax.tree_util.tree_map(jnp.asarray, params)
