"""Sub-pixel transpose-conv lowering is exactly nn.ConvTranspose(SAME).

The vocoder's upsample stages (reference ConvTranspose1d(k, u,
pad=(k-u)//2), `modules/hifigan/hifigan.py:118-125`) get a phase-packed
dense lowering (`ops/subpixel.py`); these tests pin (a) numerical
equality with the flax lowering for every (k, u) the configs use plus
irregular shapes, (b) identical param trees so checkpoints interop,
(c) the full generator is unchanged under `vocoder_subpixel: true`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from bisinger_tpu.ops.subpixel import (
    UpsampleConvTranspose,
    conv_transpose_subpixel,
    subpixel_plan,
)

# (k, u): hop-128 config [16,8,4,4]/[8,4,2,2]; official hifigan v1
# [16,16,4,4]/[8,8,2,2]; irregular k not a multiple of u; k < u edge
PAIRS = [(16, 8), (8, 4), (4, 2), (16, 8), (16, 16), (9, 4), (5, 2), (3, 4)]


@pytest.mark.parametrize("k,u", sorted(set(PAIRS)))
def test_matches_flax_conv_transpose(k, u):
    rng = np.random.RandomState(k * 100 + u)
    b, t, cin, cout = 2, 13, 5, 7
    x = jnp.asarray(rng.randn(b, t, cin), jnp.float32)
    kernel = jnp.asarray(rng.randn(k, cin, cout), jnp.float32)

    ref = jax.lax.conv_transpose(
        x, kernel, strides=(u,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    got = conv_transpose_subpixel(x, kernel, u)
    assert got.shape == (b, t * u, cout) == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_plan_tap_count():
    # k = 2u packs into exactly ceil(k/u) + 1 = 3 taps
    taps, mask, e_min, e_max = subpixel_plan(16, 8)
    assert taps.shape[0] == 3
    # every (tap, phase) pair used at most once and each kernel tap
    # appears exactly once across the plan (the arithmetic is a
    # permutation of the transpose conv's, nothing dropped)
    used = taps[mask]
    assert sorted(used.tolist()) == list(range(16))


def test_module_param_tree_matches_flax():
    x = jnp.ones((1, 8, 3))
    mine = UpsampleConvTranspose(features=6, kernel_size=8, stride=4)
    theirs = nn.ConvTranspose(6, (8,), strides=(4,), padding="SAME")
    p_mine = mine.init(jax.random.PRNGKey(0), x)["params"]
    p_theirs = theirs.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(p_mine) == jax.tree_util.tree_structure(
        p_theirs
    )
    for a, b in zip(jax.tree_util.tree_leaves(p_mine), jax.tree_util.tree_leaves(p_theirs)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # same params -> same output on both lowerings
    y_flax = theirs.apply({"params": p_theirs}, x)
    y_ref = mine.apply({"params": p_theirs}, x)
    y_sub = UpsampleConvTranspose(
        features=6, kernel_size=8, stride=4, subpixel=True
    ).apply({"params": p_theirs}, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_flax), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_flax), atol=1e-5)


def test_generator_unchanged_under_subpixel():
    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.models.hifigan import HifiGanGenerator

    base = dict(
        upsample_rates=[8, 4, 2, 2],
        upsample_kernel_sizes=[16, 8, 4, 4],
        upsample_initial_channel=32,
        audio_num_mel_bins=16,
    )
    hp0 = load_hparams(overrides=dict(base, vocoder_subpixel=False))
    hp1 = load_hparams(overrides=dict(base, vocoder_subpixel=True))
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, 24, 16), jnp.float32)
    f0 = jnp.asarray(rng.uniform(100, 300, (2, 24)), jnp.float32)

    g0 = HifiGanGenerator(hp0)
    params = g0.init({"params": jax.random.PRNGKey(0), "nsf": jax.random.PRNGKey(1)},
                     mel, f0)["params"]
    w0 = g0.apply({"params": params}, mel, f0, rngs={"nsf": jax.random.PRNGKey(2)})
    w1 = HifiGanGenerator(hp1).apply(
        {"params": params}, mel, f0, rngs={"nsf": jax.random.PRNGKey(2)}
    )
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1), atol=2e-5)
