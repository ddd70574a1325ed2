"""Mixed-precision (compute_dtype) contract for the acoustic stack.

SURVEY §7.3: train bf16 with fp32 accumulations. The contract
(models/common.py:compute_dtype): params, optimizer state, module
*outputs* and losses stay fp32; only activations inside the heavy
stacks (attention, conv-FFN, predictor convs) run in bf16, with
softmax/normalization statistics computed in fp32. DiffNet and the
HiFi-GAN generator already honored `compute_dtype`; these tests pin the
same behaviour for FastSpeech2(MIDI) and the PitchExtractor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bisinger_tpu.config import load_hparams
from bisinger_tpu.models.fs2 import FastSpeech2MIDI
from bisinger_tpu.models.pe import PitchExtractor

V = 30


@pytest.fixture(scope="module")
def hp32():
    return load_hparams(
        overrides=dict(
            hidden_size=64,
            enc_layers=1,
            dec_layers=1,
            enc_ffn_kernel_size=3,
            dec_ffn_kernel_size=3,
            predictor_hidden=64,
            compute_dtype="float32",
        )
    )


def _inputs(seed=0, B=2, T_txt=12, T_mel=64):
    rng = np.random.default_rng(seed)
    txt = rng.integers(1, V, (B, T_txt))
    txt[:, -2:] = 0
    mel2ph = np.repeat(np.arange(1, T_txt - 1), T_mel // (T_txt - 2))[None].repeat(B, 0)
    mel2ph = np.pad(mel2ph, ((0, 0), (0, T_mel - mel2ph.shape[1])))
    return dict(
        txt_tokens=jnp.asarray(txt),
        mel2ph=jnp.asarray(mel2ph),
        pitch_midi=jnp.asarray(txt % 100 + 30),
        midi_dur=jnp.asarray(np.abs(rng.normal(size=(B, T_txt))).astype(np.float32)),
        is_slur=jnp.zeros((B, T_txt), jnp.int32),
        lang=jnp.asarray(txt % 2),
        spk_embed=jnp.zeros((B,), jnp.int32),
        f0=jnp.asarray(rng.normal(size=(B, T_mel)).astype(np.float32)),
        uv=jnp.zeros((B, T_mel), jnp.float32),
    )


def test_default_compute_dtype_is_bf16():
    hp = load_hparams()
    assert hp["compute_dtype"] == "bfloat16"


def test_fs2_bf16_close_to_fp32_and_fp32_boundaries(hp32):
    hp16 = hp32.replace(compute_dtype="bfloat16")
    inp = _inputs()
    m32 = FastSpeech2MIDI(hp=hp32, vocab_size=V)
    m16 = FastSpeech2MIDI(hp=hp16, vocab_size=V)
    params = m32.init(jax.random.PRNGKey(0), **inp)["params"]

    o32 = m32.apply({"params": params}, **inp)
    o16 = m16.apply({"params": params}, **inp)

    # module boundary stays fp32 regardless of internal compute dtype
    assert o16["mel_out"].dtype == jnp.float32
    assert o16["dur"].dtype == jnp.float32

    ref = np.asarray(o32["mel_out"])
    err = np.abs(np.asarray(o16["mel_out"]) - ref)
    scale = np.abs(ref).mean()
    assert err.mean() < 0.02 * scale, (err.mean(), scale)
    assert err.max() < 0.2 * scale, (err.max(), scale)
    derr = np.abs(np.asarray(o16["dur"]) - np.asarray(o32["dur"]))
    assert derr.max() < 0.1, derr.max()


def test_fs2_bf16_grads_are_fp32_and_finite(hp32):
    hp16 = hp32.replace(compute_dtype="bfloat16")
    inp = _inputs(seed=1)
    m16 = FastSpeech2MIDI(hp=hp16, vocab_size=V)
    params = m16.init(jax.random.PRNGKey(1), **inp)["params"]
    assert {str(x.dtype) for x in jax.tree_util.tree_leaves(params)} == {"float32"}

    def loss_fn(p):
        out = m16.apply({"params": p}, **inp, deterministic=True)
        return jnp.mean(out["mel_out"] ** 2) + jnp.mean(out["dur"] ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert {str(x.dtype) for x in leaves} == {"float32"}
    assert bool(jnp.isfinite(loss))
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    # the heavy stacks actually received gradient (bf16 didn't detach)
    enc_kernel = grads["encoder"]["layer_0"]["ffn"]["Conv_0"]["kernel"]
    assert float(jnp.abs(enc_kernel).max()) > 0.0


def test_pe_bf16_close_to_fp32(hp32):
    hp16 = hp32.replace(compute_dtype="bfloat16")
    rng = np.random.default_rng(2)
    mel = rng.normal(size=(2, 64, 80)).astype(np.float32) * 2 - 5
    mel[:, -8:, :] = 0.0  # padding frames
    mel = jnp.asarray(mel)
    pe32 = PitchExtractor(hp=hp32)
    pe16 = PitchExtractor(hp=hp16)
    variables = pe32.init(jax.random.PRNGKey(2), mel)
    o32 = pe32.apply(variables, mel)
    o16 = pe16.apply(variables, mel)
    assert o16["pitch_pred"].dtype == jnp.float32
    ref = np.asarray(o32["pitch_pred"])
    err = np.abs(np.asarray(o16["pitch_pred"]) - ref)
    scale = np.abs(ref).mean() + 1e-6
    assert err.mean() < 0.05 * scale, (err.mean(), scale)
