"""Weight-norm reparameterization of GAN training (training/weight_norm.py).

The reference trains HiFi-GAN with torch.nn.utils.weight_norm on every
conv (`modules/hifigan/hifigan.py:34-50`); our GAN task reproduces that
geometry by (g, v)-decomposing the params tree outside the modules.
Pinned here: exact round-trip, function preservation at init, the
reference's skip list (noise_convs/m_source stay plain), plain-kernel
export, and that the reparameterization actually changes the training
trajectory (it is a geometry change, not a no-op).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bisinger_tpu.config import load_hparams
from bisinger_tpu.models.hifigan import HifiGanGenerator
from bisinger_tpu.training import weight_norm as wn
from bisinger_tpu.training.vocoder_task import HifiGanTask


@pytest.fixture(scope="module")
def hp():
    return load_hparams(
        overrides=dict(
            upsample_initial_channel=16,
            upsample_rates=[4, 4],
            upsample_kernel_sizes=[8, 8],
            resblock_kernel_sizes=[3],
            resblock_dilation_sizes=[[1, 3]],
            use_pitch_embed=True,
            use_nsf=True,
            hop_size=16,
            audio_sample_rate=24000,
        )
    )


@pytest.fixture(scope="module")
def gen_params(hp):
    mel = np.zeros((1, 8, 80), np.float32)
    f0 = np.full((1, 8), 220.0, np.float32)
    gen = HifiGanGenerator(hp=hp)
    params = gen.init(
        {"params": jax.random.PRNGKey(0), "nsf": jax.random.PRNGKey(1)}, mel, f0
    )["params"]
    return gen, params, mel, f0


def test_roundtrip_exact(gen_params):
    _, params, _, _ = gen_params
    dec = wn.decompose(params)
    assert wn.is_decomposed(dec) and not wn.is_decomposed(params)
    rec = wn.compose(dec)
    assert jax.tree_util.tree_structure(rec) == jax.tree_util.tree_structure(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, params)
        ),
        jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, rec)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_function_preserved_at_init(gen_params):
    gen, params, mel, f0 = gen_params
    dec = wn.decompose(params)
    out_plain = gen.apply({"params": params}, mel, f0, rngs={"nsf": jax.random.PRNGKey(2)})
    out_wn = gen.apply(
        {"params": wn.compose(dec)}, mel, f0, rngs={"nsf": jax.random.PRNGKey(2)}
    )
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_wn), rtol=1e-5, atol=1e-5
    )


def test_reference_skip_list(gen_params):
    _, params, _, _ = gen_params
    dec = wn.decompose(params)
    # noise convs and the NSF merge linear stay PLAIN (the reference
    # applies weight_norm only to ups/resblocks/conv_pre/conv_post)
    assert not wn.is_decomposed({"x": dec["noise_conv_0"]})
    assert not wn.is_decomposed({"x": dec["m_source"]})
    assert set(dec["conv_pre"]["kernel"]) == {"wn_g", "wn_v"}
    assert set(dec["up_0"]["kernel"]) == {"wn_g", "wn_v"}


def test_transpose_conv_grouping(gen_params):
    """'up_*' kernels group per IN channel (torch ConvTranspose1d dim=0),
    others per OUT channel."""
    _, params, _, _ = gen_params
    dec = wn.decompose(params)
    k_up = params["up_0"]["kernel"]  # [k, in, out]
    g_up = dec["up_0"]["kernel"]["wn_g"]
    assert g_up.shape == (1, k_up.shape[1], 1)
    k_pre = params["conv_pre"]["kernel"]
    g_pre = dec["conv_pre"]["kernel"]["wn_g"]
    assert g_pre.shape == (1, 1, k_pre.shape[2])


def test_training_geometry_changes_and_export_folds(hp):
    """One adversarial step with weight_norm on vs off from the SAME init
    diverges (the point of the reparameterization), and export_gen_params
    yields a plain tree the generator can apply."""
    rng = np.random.default_rng(0)
    frames, hop, b = 8, hp["hop_size"], 2
    batch = {
        "mels": rng.normal(-2, 1.0, (b, frames, 80)).astype(np.float32),
        "f0": np.full((b, frames), 220.0, np.float32),
        "wav": (0.1 * rng.normal(size=(b, frames * hop))).astype(np.float32),
    }
    outs = {}
    for flag in (True, False):
        task = HifiGanTask(hp.replace(vocoder_weight_norm=flag))
        gs, ds = task.init_states(
            jax.random.PRNGKey(0), batch["mels"], batch["f0"], batch["wav"]
        )
        gs, ds, m = task.train_step(gs, ds, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["gen_loss"]))
        plain = task.export_gen_params(gs.params)
        assert not wn.is_decomposed(plain)
        wav = task.generator.apply(
            {"params": plain}, batch["mels"], batch["f0"],
            rngs={"nsf": jax.random.PRNGKey(2)},
        )
        outs[flag] = np.asarray(wav)
    # same init, same data, different geometry -> different post-step nets
    assert float(np.abs(outs[True] - outs[False]).max()) > 1e-6
