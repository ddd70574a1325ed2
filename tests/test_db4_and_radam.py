"""DB-4 meta extraction tool + RAdam optimizer."""

import jax
import jax.numpy as jnp
import numpy as np

from bisinger_tpu.tools.db4_meta import extract_item, freq_to_midi, word_note_from_f0
from bisinger_tpu.training.optim import radam

_TG = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.0
        intervals: size = 3
        intervals [1]:
            xmin = 0.0
            xmax = 0.2
            text = ""
        intervals [2]:
            xmin = 0.2
            xmax = 0.7
            text = "ni"
        intervals [3]:
            xmin = 0.7
            xmax = 1.0
            text = "hao"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 5
        intervals [1]:
            xmin = 0.0
            xmax = 0.2
            text = ""
        intervals [2]:
            xmin = 0.2
            xmax = 0.4
            text = "n"
        intervals [3]:
            xmin = 0.4
            xmax = 0.7
            text = "i"
        intervals [4]:
            xmin = 0.7
            xmax = 0.85
            text = "h"
        intervals [5]:
            xmin = 0.85
            xmax = 1.0
            text = "ao"
"""


def test_freq_to_midi():
    assert freq_to_midi(440.0) == 69
    assert freq_to_midi(0.0) == 0


def test_word_note_median():
    f0 = np.zeros(100, np.float32)
    f0[20:70] = 220.0
    assert word_note_from_f0(f0, 0.2, 0.7, frame_rate=100.0) == 57  # A3
    assert word_note_from_f0(f0, 0.0, 0.2, frame_rate=100.0) == 0


def test_extract_item():
    frame_rate = 100.0
    f0 = np.zeros(100, np.float32)
    f0[20:70] = 220.0  # 'ni' voiced at A3
    f0[70:100] = 330.0  # 'hao' at E4
    item = extract_item(_TG, f0, frame_rate, "db4#cn#0001", "你好", lang=1)
    assert item["phs"] == ["<SP>", "n", "i", "h", "ao"]
    assert item["notes"][0] == 0
    assert item["notes"][1] == item["notes"][2] == 57
    assert item["notes"][3] == item["notes"][4] == freq_to_midi(330.0)
    assert item["word_boundary"] == [1, 0, 1, 0, 1]
    assert item["is_slur"] == [0] * 5
    assert abs(sum(item["ph_dur"]) - 1.0) < 1e-3
    # notes_dur replicates the word duration on each phone
    assert abs(item["notes_dur"][1] - 0.5) < 1e-6


def test_radam_converges():
    """Minimize a quadratic: RAdam must reach the optimum."""
    opt = radam(1e-1)
    params = {"w": jnp.array([3.0, -2.0])}
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(lambda p: jnp.sum((p["w"] - 1.0) ** 2))(params)
        updates, state = opt.update(grads, state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), state

    for _ in range(300):
        params, state = step(params, state)
    np.testing.assert_allclose(np.asarray(params["w"]), [1.0, 1.0], atol=1e-2)


def test_radam_early_steps_finite():
    """rho_t <= 4 early phase must produce finite (unadapted) updates."""
    opt = radam(1e-3, b2=0.999)
    params = {"w": jnp.ones(4)}
    state = opt.init(params)
    grads = {"w": jnp.full(4, 0.5)}
    updates, _ = opt.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
