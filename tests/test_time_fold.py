"""Exact time-folding of 1D convs (TPU narrow-channel optimization)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bisinger_tpu.ops.time_fold import (
    fold_conv_weight,
    fold_time,
    folded_conv,
    unfold_time,
)


def _direct(x, w, dilation):
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1,), "SAME",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


@pytest.mark.parametrize("k,d,f", [(3, 1, 4), (11, 1, 4), (11, 5, 4), (7, 3, 2), (11, 5, 8)])
def test_fold_exact(k, d, f):
    rng = np.random.default_rng(k * 100 + d * 10 + f)
    B, T, C = 2, 64, 8
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    w = rng.standard_normal((k, C, C)).astype(np.float32)
    b = rng.standard_normal(C).astype(np.float32)

    y_ref = np.asarray(_direct(jnp.asarray(x), w, d) + b[None, None])
    wf, bf, pad = fold_conv_weight(w, b, f, dilation=d)
    yf = folded_conv(fold_time(jnp.asarray(x), f), wf, bf, pad)
    y = np.asarray(unfold_time(yf, f))
    np.testing.assert_allclose(y, y_ref, atol=2e-5)


def test_roundtrip_reshape():
    x = jnp.arange(2 * 12 * 3).reshape(2, 12, 3).astype(jnp.float32)
    assert jnp.allclose(unfold_time(fold_time(x, 4), 4), x)


def test_hifigan_folded_matches_unfolded():
    """vocoder_time_fold produces the same waveform as the plain path
    (same params; exact arithmetic rewrite)."""
    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.models.hifigan import HifiGanGenerator

    base = dict(
        upsample_rates=[4, 4, 2],
        upsample_kernel_sizes=[8, 8, 4],
        upsample_initial_channel=128,  # stages: 64, 32, 16 channels
        resblock_kernel_sizes=[3, 7],
        resblock_dilation_sizes=[[1, 3], [1, 3]],
        resblock="1",
        use_pitch_embed=False,
        compute_dtype="float32",
    )
    hp0 = load_hparams(overrides=base)
    hp1 = load_hparams(overrides=dict(base, vocoder_time_fold=4))
    mel = np.asarray(
        np.random.default_rng(0).standard_normal((2, 40, 80)), np.float32
    )
    m0 = HifiGanGenerator(hp=hp0)
    params = m0.init(jax.random.PRNGKey(0), jnp.asarray(mel))["params"]
    y0 = np.asarray(m0.apply({"params": params}, mel))
    m1 = HifiGanGenerator(hp=hp1)
    y1 = np.asarray(m1.apply({"params": params}, mel))
    np.testing.assert_allclose(y1, y0, atol=2e-5)


def test_hifigan_folded_matches_unfolded_bf16():
    """Folded vs plain under the SHIPPED bf16 config: both paths compute
    in bf16 (bias cast included), so they stay close."""
    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.models.hifigan import HifiGanGenerator

    base = dict(
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=128,
        resblock_kernel_sizes=[3, 7],
        resblock_dilation_sizes=[[1, 3], [1, 3]],
        resblock="1",
        use_pitch_embed=False,
        compute_dtype="bfloat16",
    )
    hp0 = load_hparams(overrides=base)
    hp1 = load_hparams(overrides=dict(base, vocoder_time_fold=4))
    mel = np.asarray(np.random.default_rng(1).standard_normal((1, 40, 80)), np.float32)
    m0 = HifiGanGenerator(hp=hp0)
    params = m0.init(jax.random.PRNGKey(0), jnp.asarray(mel))["params"]
    y0 = np.asarray(m0.apply({"params": params}, mel))
    y1 = np.asarray(HifiGanGenerator(hp=hp1).apply({"params": params}, mel))
    # bf16 rounding differs slightly between the two summation orders
    np.testing.assert_allclose(y1, y0, atol=3e-2)
    assert np.corrcoef(y0.ravel(), y1.ravel())[0, 1] > 0.999
