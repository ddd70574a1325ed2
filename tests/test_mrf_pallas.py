"""Fused MRF Pallas kernel vs the XLA ResBlock path (interpret mode).

The kernel must reproduce the mean-of-ResBlock1 stage bit-accurately in
fp32 for both the natively-dilated and the time-folded layouts,
including chunk boundaries (overlap-save halos) and ragged tail padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bisinger_tpu.models.hifigan import FoldedResBlock1, ResBlock1
from bisinger_tpu.ops.mrf_pallas import (
    fused_mrf_stage,
    plan_stage,
    stage_halo,
)
from bisinger_tpu.ops.time_fold import fold_time

RK = (3, 7, 11)
RD = ((1, 3, 5), (1, 3, 5), (1, 3, 5))


def _init_blocks(rng, C, x):
    params = []
    for j, (k, d) in enumerate(zip(RK, RD)):
        m = ResBlock1(channels=C, kernel_size=k, dilations=d)
        params.append(m.init(jax.random.fold_in(rng, j), x)["params"])
    return params


def _xla_mrf(x, params, module_cls, **kw):
    out = 0.0
    for j, (k, d) in enumerate(zip(RK, RD)):
        m = module_cls(kernel_size=k, dilations=d, **kw)
        out = out + m.apply({"params": params[j]}, x)
    return out / len(RK)


def test_stage_halo_covers_receptive_field():
    blocks, descr = plan_stage(RK, RD, fold=1)
    # worst block: k=11, dils (1,3,5): conv1 halos 5,15,25 + conv2 5 each
    assert stage_halo(blocks) == 64  # 60 rounded to sublane tile
    assert len(descr) == 18


@pytest.mark.parametrize("tap_mode", ["static", "roll"])
@pytest.mark.parametrize("T,u_chunk", [(600, 256), (256, 1024)])
def test_fused_mrf_matches_xla_unfolded(T, u_chunk, tap_mode):
    C, B = 128, 2
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 99), (B, T, C), jnp.float32)
    params = _init_blocks(rng, C, x)
    ref = _xla_mrf(x, params, ResBlock1, channels=C)
    got = fused_mrf_stage(
        x, params, RK, RD, fold=1, u_chunk=u_chunk,
        compute_dtype=jnp.float32, tap_mode=tap_mode, interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)


def test_hifigan_pallas_mrf_matches_xla():
    """Generator end-to-end: vocoder_mrf_backend=pallas (with time-fold
    bringing the 64-ch stage to 128 lanes) equals the plain path on the
    same params."""
    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.models.hifigan import HifiGanGenerator

    base = dict(
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=256,  # stages: 128, 64 channels
        resblock_kernel_sizes=[3, 7],
        resblock_dilation_sizes=[[1, 3], [1, 3]],
        resblock="1",
        use_pitch_embed=False,
        compute_dtype="float32",
        vocoder_time_fold=4,
    )
    hp0 = load_hparams(overrides=base)
    hp1 = load_hparams(overrides=dict(base, vocoder_mrf_backend="pallas"))
    mel = np.asarray(
        np.random.default_rng(2).standard_normal((2, 40, 80)), np.float32
    )
    m0 = HifiGanGenerator(hp=hp0)
    params = m0.init(jax.random.PRNGKey(0), jnp.asarray(mel))["params"]
    y0 = np.asarray(m0.apply({"params": params}, mel))
    y1 = np.asarray(HifiGanGenerator(hp=hp1).apply({"params": params}, mel))
    np.testing.assert_allclose(y1, y0, atol=2e-5)


def test_fused_mrf_matches_xla_folded():
    C, fold, B, T = 32, 4, 2, 512  # folded: [B, 128, 128]
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(jax.random.fold_in(rng, 7), (B, T, C), jnp.float32)
    params = _init_blocks(rng, C, x)
    xf = fold_time(x, fold)
    ref = _xla_mrf(xf, params, FoldedResBlock1, channels=C, fold=fold)
    got = fused_mrf_stage(
        xf, params, RK, RD, fold=fold,
        u_chunk=64, compute_dtype=jnp.float32, interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)
