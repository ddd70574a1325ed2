"""Weight-norm reparameterization for GAN training (reference parity).

The reference wraps every HiFi-GAN generator/discriminator conv in
`torch.nn.utils.weight_norm` (`modules/hifigan/hifigan.py:20-23,34-50,
118-140`): the kernel is stored as (g, v) and materialized as
kernel = g * v / ||v||. This changes the OPTIMIZATION GEOMETRY of
adversarial training (per-channel direction/magnitude decoupling of the
gradient), not the function class — round-4 review flagged training with
plain kernels as the one remaining recipe deviation.

This module reparameterizes a params TREE outside the flax modules:
  decompose(params)  at train start   (kernel -> {"wn_g","wn_v"})
  compose(params)    inside the jitted loss (differentiable: grads flow
                     to g and v exactly as in torch)
  compose(...)       again on export, so checkpoints keep PLAIN kernels
                     and every inference path / importer is untouched.

Grouping follows torch's default dim=0 on the reference layouts:
  Conv   torch [out, in, *k] -> per-OUT norm  -> flax [*k, in, out]:
         reduce all axes but the last
  ConvTranspose1d torch [in, out, k] -> per-IN norm -> flax [k, in, out]
         (generator 'up_*' kernels): reduce all axes but -2

Excluded (reference applies no weight_norm there): the NSF noise_convs,
the m_source merge linear, and all norm-layer scales
(`modules/hifigan/hifigan.py:126-136` wraps only ups/resblocks/conv_pre/
conv_post; `source.py` and noise_convs are plain).
"""

from __future__ import annotations

import jax.numpy as jnp

WN_SKIP = ("noise_conv", "m_source", "norm")


def _axes(path, leaf):
    if any(p.startswith("up_") for p in path):
        return tuple(i for i in range(leaf.ndim) if i != leaf.ndim - 2)
    return tuple(range(leaf.ndim - 1))


def _skip(path) -> bool:
    return any(s in p for p in path for s in WN_SKIP)


def decompose(params):
    """kernel leaves -> {"wn_g": ||kernel||_group, "wn_v": kernel}."""

    def rec(tree, path):
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                out[k] = rec(v, p)
            elif k == "kernel" and getattr(v, "ndim", 0) >= 2 and not _skip(p):
                g = jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=_axes(p, v), keepdims=True)
                )
                out[k] = {"wn_g": g, "wn_v": v}
            else:
                out[k] = v
        return out

    return rec(params, ())


def compose(params):
    """Inverse of decompose; differentiable (use inside the loss)."""

    def rec(tree, path):
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict) and set(v) == {"wn_g", "wn_v"}:
                n = jnp.sqrt(
                    jnp.sum(
                        jnp.square(v["wn_v"]), axis=_axes(p, v["wn_v"]),
                        keepdims=True,
                    )
                )
                out[k] = v["wn_g"] * v["wn_v"] / jnp.maximum(n, 1e-12)
            elif isinstance(v, dict):
                out[k] = rec(v, p)
            else:
                out[k] = v
        return out

    return rec(params, ())


def is_decomposed(params) -> bool:
    found = []

    def rec(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                if set(v) == {"wn_g", "wn_v"}:
                    found.append(k)
                else:
                    rec(v)

    rec(params)
    return bool(found)
