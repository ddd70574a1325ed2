"""PWG-tail parity: ResidualParallelWaveGANDiscriminator vs an
independently-written torch WaveNet twin, and the static-shape
cyclic-noise excitation family vs loop-reference semantics.

Covers the last vendored-PWG reference classes
(`modules/parallel_wavegan/models/parallel_wavegan.py:300-431`,
`models/source.py:141-351`). The torch twin below is written from the
public WaveNet-discriminator architecture, not copied."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bisinger_tpu.models.pwg import (
    ResidualParallelWaveGANDiscriminator,
    cyclic_noise_gen,
    pulse_gen,
    source_module_cyc_noise,
)

SR = 24000


# ---------------------------------------------------------------------------
# ResidualParallelWaveGANDiscriminator
# ---------------------------------------------------------------------------
def _build_torch_twin(layers, stacks, res_ch, gate_ch, skip_ch, k):
    torch = pytest.importorskip("torch")
    nn = torch.nn

    class Block(nn.Module):
        def __init__(self, dilation):
            super().__init__()
            pad = (k - 1) // 2 * dilation
            self.conv = nn.Conv1d(res_ch, gate_ch, k, padding=pad, dilation=dilation)
            self.out = nn.Conv1d(gate_ch // 2, res_ch, 1)
            self.skip = nn.Conv1d(gate_ch // 2, skip_ch, 1)

        def forward(self, x):
            res = x
            y = self.conv(x)
            a, b = y.split(y.size(1) // 2, dim=1)
            y = torch.tanh(a) * torch.sigmoid(b)
            return (self.out(y) + res) * float(np.sqrt(0.5)), self.skip(y)

    class Twin(nn.Module):
        def __init__(self):
            super().__init__()
            self.first = nn.Conv1d(1, res_ch, 1)
            per = layers // stacks
            self.blocks = nn.ModuleList(Block(2 ** (i % per)) for i in range(layers))
            self.post1 = nn.Conv1d(skip_ch, skip_ch, 1)
            self.post2 = nn.Conv1d(skip_ch, 1, 1)

        def forward(self, x):
            lrelu = torch.nn.functional.leaky_relu
            x = lrelu(self.first(x[:, None, :]), 0.2)
            skips = 0.0
            for blk in self.blocks:
                x, s = blk(x)
                skips = skips + s
            y = skips * float(np.sqrt(1.0 / layers))
            y = lrelu(y, 0.2)
            y = lrelu(self.post1(y), 0.2)
            return self.post2(y)[:, 0, :]

    return Twin()


def _t2f(conv):
    """torch Conv1d -> flax nn.Conv param dict."""
    return {
        "kernel": np.ascontiguousarray(
            conv.weight.detach().numpy().transpose(2, 1, 0)
        ),
        "bias": conv.bias.detach().numpy(),
    }


def test_residual_discriminator_matches_torch_twin():
    torch = pytest.importorskip("torch")
    layers, stacks, res_ch, gate_ch, skip_ch, k = 6, 3, 16, 32, 16, 3
    twin = _build_torch_twin(layers, stacks, res_ch, gate_ch, skip_ch, k)
    twin.eval()

    params = {
        "first_conv": _t2f(twin.first),
        "post_conv_1": _t2f(twin.post1),
        "post_conv_2": _t2f(twin.post2),
    }
    for i, blk in enumerate(twin.blocks):
        params[f"block_{i}"] = {
            "conv": _t2f(blk.conv),
            "out_conv": _t2f(blk.out),
            "skip_conv": _t2f(blk.skip),
        }

    model = ResidualParallelWaveGANDiscriminator(
        layers=layers, stacks=stacks, residual_channels=res_ch,
        gate_channels=gate_ch, skip_channels=skip_ch, kernel_size=k,
    )
    x = np.random.RandomState(0).randn(2, 256).astype(np.float32)
    # param-tree compatibility with init
    init_p = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    assert jax.tree_util.tree_structure(init_p) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, params)
    )
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        ref = twin(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_residual_discriminator_default_shape():
    model = ResidualParallelWaveGANDiscriminator(layers=6, stacks=3)
    x = jnp.zeros((1, 128))
    p = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": p}, x)
    assert out.shape == (1, 128)


# ---------------------------------------------------------------------------
# Cyclic-noise excitation family
# ---------------------------------------------------------------------------
def _f0_track(t=4000):
    """f0 with two voiced segments separated by an unvoiced gap."""
    f0 = np.zeros((1, t, 1), np.float32)
    f0[0, 200:1500, 0] = 220.0
    f0[0, 2200:3600, 0] = 330.0
    return f0


def _loop_pulse_phase(f0, sr):
    """Independent loop reference of the reference's flag_for_pulse phase
    reset (`source.py:75-102`): accumulate rad, reset at the last step of
    every unvoiced segment."""
    rad = (f0 / sr) % 1.0
    uv = (f0 > 0).astype(np.float64)
    T = len(rad)
    uv_next = np.append(uv[1:], 1.0)
    u_loc = (uv < 1) & (uv_next > 0)
    c, last_reset = 0.0, 0.0
    phase = np.zeros(T)
    for t in range(T):
        c += rad[t]
        if u_loc[t]:
            last_reset = c
        phase[t] = c - last_reset
    return phase


def test_pulse_gen_phase_reset_matches_loop_reference():
    f0 = _f0_track()
    rng = jax.random.PRNGKey(0)
    pulse, sine, uv, noise = pulse_gen(
        jnp.asarray(f0), rng, SR, pulse_amp=1.0, noise_std=0.0
    )
    phase = _loop_pulse_phase(f0[0, :, 0].astype(np.float64), SR)
    want = np.cos(phase * 2 * np.pi)
    got = np.asarray(sine)[0, :, 0] / np.maximum(np.asarray(uv)[0, :, 0], 1e-9)
    voiced = f0[0, :, 0] > 0
    np.testing.assert_allclose(got[voiced], want[voiced], rtol=1e-4, atol=1e-4)
    # first step of each voiced segment is ~cos(small) ~ 1 (pulse onset)
    assert got[200] > 0.99 and got[2200] > 0.99


def test_pulse_train_spacing_matches_period():
    f0 = np.zeros((1, 4000, 1), np.float32)
    f0[0, :, 0] = 200.0  # constant 200 Hz -> period = SR/200 = 120 samples
    pulse, _, _, _ = pulse_gen(jnp.asarray(f0), jax.random.PRNGKey(1), SR,
                               pulse_amp=1.0, noise_std=0.0)
    locs = np.where(np.asarray(pulse)[0, :, 0] > 0.5)[0]
    spacing = np.diff(locs)
    assert len(locs) > 20
    np.testing.assert_allclose(spacing, SR / 200.0, atol=1.0)


def test_cyclic_noise_gen_structure():
    """Cyclic noise's defining property: pitch-periodic energy bursts.
    With beta=0.1 at 200 Hz the noise burst decays in ~12 samples while
    pulses arrive every 120, so the energy envelope autocorrelates at
    the pitch period and decorrelates at the half period."""
    f0 = np.zeros((1, 4800, 1), np.float32)
    f0[0, :, 0] = 200.0  # period = 120 samples
    cyc, pulse, sine, uv, noise = cyclic_noise_gen(
        jnp.asarray(f0), jnp.asarray(0.1), jax.random.PRNGKey(2), SR,
        noise_std=0.003,
    )
    cyc = np.asarray(cyc)
    assert cyc.shape == f0.shape and np.isfinite(cyc).all()
    e = cyc[0, 1000:4600, 0] ** 2
    e = e - e.mean()

    def autocorr(lag):
        return float((e[:-lag] * e[lag:]).mean())

    period = SR // 200
    assert autocorr(period) > 5 * abs(autocorr(period // 2))


def test_cyclic_noise_all_unvoiced_is_pure_noise():
    f0 = np.zeros((1, 1024, 1), np.float32)
    cyc, *_ = cyclic_noise_gen(
        jnp.asarray(f0), jnp.asarray(0.01), jax.random.PRNGKey(3), SR,
        noise_std=0.003,
    )
    cyc = np.asarray(cyc)
    assert np.isfinite(cyc).all()
    assert np.abs(cyc).max() < 0.02  # noise floor only, no bursts


def test_source_module_cyc_noise_outputs():
    f0 = _f0_track(2048)
    cyc, noise, uv = source_module_cyc_noise(
        jnp.asarray(f0), jnp.asarray(0.01), jax.random.PRNGKey(4), SR
    )
    assert cyc.shape == noise.shape == uv.shape == f0.shape
    assert float(jnp.abs(noise).std()) < 0.01
    np.testing.assert_array_equal(np.asarray(uv)[0, :, 0] > 0, f0[0, :, 0] > 0)


def test_cyclic_noise_jits():
    f0 = jnp.asarray(_f0_track(1024))

    @jax.jit
    def run(f0, beta, rng):
        return cyclic_noise_gen(f0, beta, rng, SR)[0]

    out = run(f0, jnp.asarray(0.02), jax.random.PRNGKey(5))
    assert np.isfinite(np.asarray(out)).all()
