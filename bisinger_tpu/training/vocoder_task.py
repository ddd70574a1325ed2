"""HiFi-GAN vocoder training task.

The reference ships the HiFi-GAN discriminators and losses
(`modules/hifigan/hifigan.py:185-369`) but NOT the training task
(`tasks/vocoder/*` is referenced by `configs/tts/hifigan.yaml:2` yet
absent). This module completes the stack: adversarial generator training
with MPD + MSD, LSGAN losses, feature matching, mel-spectrogram L1
(lambda_mel=45, HiFi-GAN paper) and optional multi-resolution STFT loss
(the PWG auxiliary loss, `modules/parallel_wavegan/losses/stft_loss.py`).

Two optimizers (gen/disc) stepped in one jitted function; data is
(mel [B, T, 80], f0 [B, T], wav [B, T*hop]) windows.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from bisinger_tpu.config import HParams
from bisinger_tpu.models.hifigan import (
    HifiGanGenerator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from bisinger_tpu.ops.stft import stft_magnitude


def multi_resolution_stft_loss(
    wav_pred,
    wav_gt,
    resolutions=((1024, 120, 600), (2048, 240, 1200), (512, 50, 240)),
):
    """Spectral-convergence + log-magnitude loss over several STFT
    resolutions (PWG convention, reference
    `modules/parallel_wavegan/losses/stft_loss.py`)."""
    sc_total, mag_total = 0.0, 0.0
    for fft, hop, win in resolutions:
        s_pred = stft_magnitude(wav_pred, fft, hop, win)
        s_gt = stft_magnitude(wav_gt, fft, hop, win)
        sc = jnp.linalg.norm(s_gt - s_pred) / jnp.maximum(
            jnp.linalg.norm(s_gt), 1e-6
        )
        mag = jnp.abs(jnp.log(jnp.maximum(s_gt, 1e-6)) - jnp.log(jnp.maximum(s_pred, 1e-6))).mean()
        sc_total = sc_total + sc
        mag_total = mag_total + mag
    n = len(resolutions)
    return sc_total / n, mag_total / n


def mel_l1(wav_pred, wav_gt, hp: HParams):
    from bisinger_tpu.ops.stft import log_mel_spectrogram

    kw = dict(
        sample_rate=hp["audio_sample_rate"],
        fft_size=hp["fft_size"],
        hop_size=hp["hop_size"],
        win_size=hp["win_size"],
        num_mels=hp["audio_num_mel_bins"],
        fmin=hp["fmin"],
        fmax=hp["fmax"],
    )
    return jnp.abs(
        log_mel_spectrogram(wav_pred, **kw) - log_mel_spectrogram(wav_gt, **kw)
    ).mean()


class GANTrainState(train_state.TrainState):
    pass


class HifiGanTask:
    def __init__(self, hp: HParams):
        self.hp = hp
        self.generator = HifiGanGenerator(hp=hp)
        self.mpd = MultiPeriodDiscriminator()
        self.msd = MultiScaleDiscriminator()
        lr = hp.get("vocoder_lr", 2e-4)
        b1 = hp.get("vocoder_adam_b1", 0.8)
        b2 = hp.get("vocoder_adam_b2", 0.99)
        self.gen_tx = optax.adamw(lr, b1=b1, b2=b2)
        self.disc_tx = optax.adamw(lr, b1=b1, b2=b2)
        self.lambda_mel = hp.get("lambda_mel", 45.0)
        self.use_mrstft = hp.get("use_mrstft_loss", False)
        # weight-norm reparameterization of every conv kernel, matching
        # the reference's torch.nn.utils.weight_norm training geometry
        # (training/weight_norm.py). Params are decomposed at init and
        # composed inside the jitted losses; export paths fold back to
        # plain kernels so inference/checkpoints are unchanged.
        self.weight_norm = bool(hp.get("vocoder_weight_norm", True))
        # multiband fast mode: the generator emits PQMF subbands; the
        # discriminators and losses see the PQMF-synthesized full-band
        # wav, so the rest of the GAN recipe is unchanged
        from bisinger_tpu.models.pwg import pqmf_from_hparams

        self.pqmf = pqmf_from_hparams(hp)

    def init_states(self, rng, mel, f0, wav) -> Tuple[GANTrainState, GANTrainState]:
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        gen_params = self.generator.init({"params": r1, "nsf": r2}, mel, f0)["params"]
        mpd_params = self.mpd.init(r3, wav, wav)["params"]
        msd_params = self.msd.init(r4, wav, wav)["params"]
        if self.weight_norm:
            from bisinger_tpu.training import weight_norm as wn

            gen_params = wn.decompose(gen_params)
            mpd_params = wn.decompose(mpd_params)
            msd_params = wn.decompose(msd_params)
        gen_state = GANTrainState.create(
            apply_fn=self.generator.apply, params=gen_params, tx=self.gen_tx
        )
        disc_state = GANTrainState.create(
            apply_fn=None,
            params={"mpd": mpd_params, "msd": msd_params},
            tx=self.disc_tx,
        )
        return gen_state, disc_state

    def _maybe_compose(self, params):
        if self.weight_norm:
            from bisinger_tpu.training import weight_norm as wn

            return wn.compose(params)
        return params

    def export_gen_params(self, gen_params):
        """Plain-kernel generator tree for npz export / inference."""
        return self._maybe_compose(jax.device_get(gen_params))

    def _generate(self, gen_params, mel, f0, rng):
        out = self.generator.apply(
            {"params": self._maybe_compose(gen_params)}, mel, f0, rngs={"nsf": rng}
        )
        return self.pqmf.synthesis(out) if self.pqmf is not None else out

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def train_step(
        self,
        gen_state: GANTrainState,
        disc_state: GANTrainState,
        batch: Dict[str, Any],
        rng,
    ):
        mel, f0, wav = batch["mels"], batch["f0"], batch["wav"]
        rng_g, _ = jax.random.split(rng)  # one fake per step (reference behavior)

        # ---- discriminator update ----
        wav_fake = jax.lax.stop_gradient(
            self._generate(gen_state.params, mel, f0, rng_g)
        )

        def disc_loss_fn(dparams):
            mpd_r, mpd_g, _, _ = self.mpd.apply(
                {"params": self._maybe_compose(dparams["mpd"])}, wav, wav_fake
            )
            msd_r, msd_g, _, _ = self.msd.apply(
                {"params": self._maybe_compose(dparams["msd"])}, wav, wav_fake
            )
            r1, g1 = discriminator_loss(mpd_r, mpd_g)
            r2, g2 = discriminator_loss(msd_r, msd_g)
            return r1 + g1 + r2 + g2, {"disc_real": r1 + r2, "disc_fake": g1 + g2}

        (d_loss, d_aux), d_grads = jax.value_and_grad(disc_loss_fn, has_aux=True)(
            disc_state.params
        )
        disc_state = disc_state.apply_gradients(grads=d_grads)

        # ---- generator update ----
        def gen_loss_fn(gparams):
            fake = self._generate(gparams, mel, f0, rng_g)
            _, mpd_g, fmap_mr, fmap_mg = self.mpd.apply(
                {"params": self._maybe_compose(disc_state.params["mpd"])}, wav, fake
            )
            _, msd_g, fmap_sr, fmap_sg = self.msd.apply(
                {"params": self._maybe_compose(disc_state.params["msd"])}, wav, fake
            )
            adv = generator_loss(mpd_g) + generator_loss(msd_g)
            fm = feature_loss(fmap_mr, fmap_mg) + feature_loss(fmap_sr, fmap_sg)
            mel_loss = mel_l1(fake, wav, self.hp) * self.lambda_mel
            total = adv + fm + mel_loss
            aux = {"gen_adv": adv, "gen_fm": fm, "gen_mel": mel_loss}
            if self.use_mrstft:
                sc, mag = multi_resolution_stft_loss(fake, wav)
                total = total + sc + mag
                aux["gen_sc"] = sc
                aux["gen_mag"] = mag
            return total, aux

        (g_loss, g_aux), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            gen_state.params
        )
        gen_state = gen_state.apply_gradients(grads=g_grads)

        metrics = {"disc_loss": d_loss, "gen_loss": g_loss, **d_aux, **g_aux}
        return gen_state, disc_state, metrics
