"""MoG/CRF duration heads (reference tts_modules.py:98-133; MoG decode
is NotImplemented in the reference — here it decodes by expectation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bisinger_tpu.models.predictors import (
    DurationPredictor,
    crf_log_likelihood,
    crf_viterbi,
    mog_dur_nll,
)


def test_mse_head_roundtrip():
    dp = DurationPredictor(odims=1, n_chans=32)
    x = jnp.zeros((2, 8, 16))
    params = dp.init(jax.random.PRNGKey(0), x)["params"]
    out = dp.apply({"params": params}, x)
    assert out.shape == (2, 8)
    dur = dp.apply({"params": params}, jnp.log(jnp.array([[4.0]])), method=DurationPredictor.out2dur)
    assert int(dur[0, 0]) == 3  # round(exp(log 4) - 1)


def test_mog_head_decode_and_nll():
    dp = DurationPredictor(odims=15, n_chans=32)
    x = jnp.ones((2, 8, 16))
    params = dp.init(jax.random.PRNGKey(0), x)["params"]
    xs = dp.apply({"params": params}, x)
    assert xs.shape == (2, 8, 15)
    dur = dp.apply({"params": params}, xs, method=DurationPredictor.out2dur)
    assert dur.shape == (2, 8) and (np.asarray(dur) >= 0).all()

    nll = mog_dur_nll(xs, jnp.full((2, 8), 3.0))
    assert np.isfinite(float(nll))
    # fitting the head on a constant target must reduce NLL
    loss = lambda p: mog_dur_nll(dp.apply({"params": p}, x), jnp.full((2, 8), 3.0))
    p2 = params
    for _ in range(20):
        grads = jax.grad(loss)(p2)
        p2 = jax.tree.map(lambda p, g: p - 0.05 * g, p2, grads)
    assert float(loss(p2)) < float(nll)


def test_crf_viterbi_prefers_emissions():
    """With zero transitions, Viterbi = argmax of emissions."""
    rng = np.random.default_rng(0)
    em = jnp.asarray(rng.standard_normal((2, 6, 5)).astype(np.float32))
    path = crf_viterbi(em, jnp.zeros((5, 5)))
    np.testing.assert_array_equal(np.asarray(path), np.argmax(np.asarray(em), -1))


def test_crf_viterbi_transitions_matter():
    """Strongly negative transition out of state 0 forces a stay."""
    em = jnp.zeros((1, 4, 3)).at[0, 0, 0].set(5.0)
    trans = jnp.full((3, 3), -10.0).at[0, 0].set(0.0)
    path = crf_viterbi(em, trans)
    np.testing.assert_array_equal(np.asarray(path)[0], [0, 0, 0, 0])


def test_crf_log_likelihood_normalized():
    """exp(ll) over all tag sequences sums to 1 for a tiny chain."""
    import itertools

    rng = np.random.default_rng(1)
    em = jnp.asarray(rng.standard_normal((1, 3, 2)).astype(np.float32))
    trans = jnp.asarray(rng.standard_normal((2, 2)).astype(np.float32))
    total = 0.0
    for tags in itertools.product([0, 1], repeat=3):
        ll = crf_log_likelihood(em, trans, jnp.asarray([list(tags)]))
        total += float(jnp.exp(ll)[0])
    assert abs(total - 1.0) < 1e-4


def test_crf_head_in_predictor():
    dp = DurationPredictor(odims=32, n_chans=32)
    x = jnp.ones((1, 6, 16))
    params = dp.init(jax.random.PRNGKey(0), x)["params"]
    xs = dp.apply({"params": params}, x)
    dur = dp.apply({"params": params}, xs, method=DurationPredictor.out2dur)
    assert dur.shape == (1, 6)
    assert ((np.asarray(dur) >= 0) & (np.asarray(dur) < 32)).all()


def test_mog_and_crf_train_end_to_end():
    """dur_loss=mog and =crf train through the full MIDI task (regression
    for the unwired-loss crash: [B,T,15] vs [B,T] broadcast error)."""
    from __graft_entry__ import _batch, _tiny_hp
    from bisinger_tpu.training.tasks import AuxDecoderMIDITask

    # crf is speech-only now: MIDI configs must refuse it (durations
    # routinely exceed the 31-frame torchcrf ceiling)
    with pytest.raises(ValueError, match="crf"):
        AuxDecoderMIDITask(_tiny_hp().replace(dur_loss="crf"), 32)

    for dur_loss in ("mog", "crf"):
        hp = _tiny_hp().replace(dur_loss=dur_loss)
        if dur_loss == "crf":
            hp = hp.replace(use_midi=False)
        task = AuxDecoderMIDITask(hp, 32)
        batch = _batch(2, 16, 64, 32)
        state = task.init_state(jax.random.PRNGKey(0), batch)
        state, losses = task.train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(losses["total_loss"])), dur_loss
        assert np.isfinite(float(losses["pdur"])), dur_loss
        # inference decode works too
        ret = task.infer_step(state.params, batch, jax.random.PRNGKey(2))
        assert np.isfinite(np.asarray(ret["mel_out"])).all(), dur_loss


def test_crf_viterbi_padding_invariant():
    """Decoded path over the valid region must not depend on trailing
    padding length (the recursion freezes at the mask boundary)."""
    rng = np.random.default_rng(3)
    em = jnp.asarray(rng.normal(size=(2, 6, 5)).astype(np.float32))
    tr = jnp.asarray(rng.normal(size=(5, 5)).astype(np.float32))
    mask6 = jnp.ones((2, 6))
    base = crf_viterbi(em, tr, mask=mask6)
    # pad to T=10 with junk emissions; mask marks them invalid
    em_pad = jnp.concatenate(
        [em, jnp.asarray(rng.normal(size=(2, 4, 5)).astype(np.float32))], axis=1
    )
    mask10 = jnp.concatenate([mask6, jnp.zeros((2, 4))], axis=1)
    padded = crf_viterbi(em_pad, tr, mask=mask10)
    np.testing.assert_array_equal(np.asarray(padded)[:, :6], np.asarray(base))
