import os

import jax
import numpy as np
import pytest

from bisinger_tpu.config import load_hparams
from bisinger_tpu.data.binarizer import M4SingerBinarizer
from bisinger_tpu.data.dataset import DataLoader, M4SingerDataset
from bisinger_tpu.data.synthetic import make_synthetic_corpus
from bisinger_tpu.training.losses import (
    add_dur_loss_midi,
    mel_l1_loss,
    mel_ssim_loss,
    parse_mel_loss_spec,
)
from bisinger_tpu.training.optim import predictor_only_mask, rsqrt_schedule, step_decay_schedule
from bisinger_tpu.training.tasks import (
    AuxDecoderMIDITask,
    DiffSingerMIDITask,
    PitchExtractionTask,
)
from bisinger_tpu.training.trainer import Trainer, device_batch
from bisinger_tpu.utils.text_encoder import build_phone_encoder

import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("exp")
    raw = str(root / "raw")
    make_synthetic_corpus(raw, n_items=10, seed=0)
    hp = load_hparams(
        overrides=dict(
            raw_data_dir=raw,
            raw_json_fn="meta.json",
            binary_data_dir=str(root / "binary"),
            work_dir=str(root / "work"),
            num_spk=4,
            test_prefixes=["Alto-1#song0"],
            pitch_extractor="autocorr",
            hidden_size=16,
            enc_layers=1,
            dec_layers=1,
            enc_ffn_kernel_size=3,
            dec_ffn_kernel_size=3,
            residual_layers=2,
            residual_channels=16,
            timesteps=4,
            K_step=4,
            predictor_layers=2,
            dur_predictor_layers=2,
            use_pitch_embed=False,
            bucket_tokens=[32],
            bucket_frames=[256],
            max_tokens=4000,
            max_sentences=8,
            max_words=32,
            log_interval=2,
            val_check_interval=4,
            num_sanity_val_steps=1,
            num_ckpt_keep=2,
            warmup_updates=2,
            lr=1e-3,
            clip_grad_norm=1.0,
        )
    )
    M4SingerBinarizer(hp).process()
    return hp


class TestSchedules:
    def test_rsqrt(self):
        hp = load_hparams(overrides=dict(lr=1.0, warmup_updates=100, hidden_size=256))
        s = rsqrt_schedule(hp)
        assert float(s(1)) < float(s(100))
        assert float(s(100)) > float(s(10000))  # decays after warmup
        np.testing.assert_allclose(
            float(s(100)), 1.0 * (100 ** -0.5) * (256 ** -0.5), rtol=1e-6
        )

    def test_step_decay(self):
        hp = load_hparams(overrides=dict(lr=0.01, decay_steps=10))
        s = step_decay_schedule(hp)
        assert np.isclose(float(s(5)), 0.01)
        assert np.isclose(float(s(15)), 0.005)
        assert np.isclose(float(s(25)), 0.0025)

    def test_step_decay_guards_rsqrt_scale_lr(self):
        """The global default lr=2.0 is the rsqrt scale factor; fed raw
        into AdamW it diverges — the step schedule substitutes the
        reference diffusion default 0.001 (`usr/configs/base.yaml:7`)."""
        hp = load_hparams(overrides=dict(decay_steps=10))  # default lr=2.0
        s = step_decay_schedule(hp)
        assert np.isclose(float(s(5)), 0.001)


class TestLosses:
    def test_parse_mel_loss_spec(self):
        assert parse_mel_loss_spec("l1:0.5|ssim:0.5") == {"l1": 0.5, "ssim": 0.5}
        assert parse_mel_loss_spec("l1") == {"l1": 1.0}

    def test_mel_l1_ignores_padding(self):
        target = jnp.zeros((1, 10, 4)).at[:, :5].set(1.0)
        out = jnp.zeros((1, 10, 4))
        # only the 5 nonzero frames count
        assert float(mel_l1_loss(out, target)) == pytest.approx(1.0)

    def test_ssim_identical_is_zero(self):
        x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 16).astype(np.float32))
        assert float(mel_ssim_loss(x, x)) == pytest.approx(0.0, abs=1e-5)
        y = x + 0.5 * np.random.RandomState(1).rand(1, 32, 16).astype(np.float32)
        assert float(mel_ssim_loss(y, x)) > 0.01

    def test_dur_loss_zero_when_exact(self):
        txt = jnp.asarray([[5, 6, 7, 0]])
        mel2ph = jnp.asarray([[1, 1, 2, 3, 3, 3, 0, 0]])
        dur_gt = jnp.asarray([[2.0, 1.0, 3.0, 0.0]])
        dur_pred_log = jnp.log(dur_gt + 1.0)
        wdb = jnp.asarray([[0, 1, 0, 0]])
        hp = load_hparams(overrides=dict(max_words=8))
        losses = {}
        add_dur_loss_midi(dur_pred_log, mel2ph, txt, wdb, losses, hp)
        assert float(losses["pdur"]) == pytest.approx(0.0, abs=1e-6)
        assert float(losses["wdur"]) == pytest.approx(0.0, abs=1e-6)
        assert float(losses["sdur"]) == pytest.approx(0.0, abs=1e-6)


class TestTasks:
    def _first_batch(self, hp):
        ds = M4SingerDataset(hp, "train", shuffle=False)
        dl = DataLoader(ds, hp, shuffle=False)
        batch = next(iter(dl))
        return {
            k: v for k, v in batch.items() if k not in ("item_names", "ids", "nsamples")
        }

    def test_fs2_task_loss_decreases(self, tiny_env):
        hp = tiny_env
        enc = build_phone_encoder(hp["binary_data_dir"])
        task = AuxDecoderMIDITask(hp, enc.vocab_size)
        batch = self._first_batch(hp)
        rng = jax.random.PRNGKey(0)
        state = task.init_state(rng, batch)
        first = None
        for i in range(8):
            rng, step_rng = jax.random.split(rng)
            state, losses = task.train_step(state, dict(batch), step_rng)
            if first is None:
                first = float(losses["total_loss"])
        assert np.isfinite(first)
        assert float(losses["total_loss"]) < first  # learns the tiny batch

    def test_diffusion_task_step(self, tiny_env):
        hp = tiny_env
        enc = build_phone_encoder(hp["binary_data_dir"])
        task = DiffSingerMIDITask(hp, enc.vocab_size)
        batch = self._first_batch(hp)
        rng = jax.random.PRNGKey(0)
        state = task.init_state(rng, batch)
        state, losses = task.train_step(state, dict(batch), rng)
        assert np.isfinite(float(losses["mel"]))
        assert "pdur" in losses and "wdur" in losses

    def test_diffusion_freeze_fs2_mask(self, tiny_env):
        hp = tiny_env
        enc = build_phone_encoder(hp["binary_data_dir"])
        task = DiffSingerMIDITask(hp, enc.vocab_size, freeze_fs2=True)
        batch = self._first_batch(hp)
        state = task.init_state(jax.random.PRNGKey(0), batch)
        before = jax.device_get(state.params)
        state, _ = task.train_step(state, dict(batch), jax.random.PRNGKey(1))
        after = jax.device_get(state.params)
        # frozen: fs2 encoder token embedding unchanged
        np.testing.assert_array_equal(
            before["fs2"]["token_embed"]["embed"]["embedding"],
            after["fs2"]["token_embed"]["embed"]["embedding"],
        )
        # trainable: denoiser weights moved (output_projection is the only
        # denoiser layer with nonzero grad at step 1 — it is zero-init, so
        # upstream grads vanish until it moves)
        assert not np.array_equal(
            before["denoise_fn"]["output_projection"]["bias"],
            after["denoise_fn"]["output_projection"]["bias"],
        )
        # trainable: fs2 duration predictor moved
        assert not np.array_equal(
            before["fs2"]["dur_predictor"]["linear"]["kernel"],
            after["fs2"]["dur_predictor"]["linear"]["kernel"],
        )

    def test_predictor_only_mask_shape(self, tiny_env):
        hp = tiny_env
        enc = build_phone_encoder(hp["binary_data_dir"])
        task = DiffSingerMIDITask(hp, enc.vocab_size)
        batch = self._first_batch(hp)
        state = task.init_state(jax.random.PRNGKey(0), batch)
        mask = predictor_only_mask(state.params)
        flat = jax.tree_util.tree_leaves(mask)
        assert any(flat) and not all(flat)

    def test_pe_task_step(self, tiny_env):
        hp = tiny_env.replace(use_pitch_embed=True, pitch_type="frame")
        task = PitchExtractionTask(hp)
        batch = self._first_batch(hp)
        state = task.init_state(jax.random.PRNGKey(0), batch)
        state, losses = task.train_step(state, dict(batch), jax.random.PRNGKey(1))
        assert np.isfinite(float(losses["total_loss"]))
        assert "f0" in losses and "uv" in losses


class TestTrainerLoop:
    def test_fit_and_resume(self, tiny_env, tmp_path):
        hp = tiny_env.replace(work_dir=str(tmp_path / "work"))
        enc = build_phone_encoder(hp["binary_data_dir"])
        task = AuxDecoderMIDITask(hp, enc.vocab_size)
        trainer = Trainer(task, hp)
        state = trainer.fit(max_updates=5)
        assert int(state.step) == 5
        assert trainer.ckpt.latest_step() == 5
        # resume continues from checkpoint
        task2 = AuxDecoderMIDITask(hp, enc.vocab_size)
        trainer2 = Trainer(task2, hp)
        state2 = trainer2.fit(max_updates=7)
        assert int(state2.step) == 7


def test_offline_diffusion_task(tiny_env, tmp_path):
    """DiffSingerOfflineTask: fs2 mels from disk drive the shallow start
    (reference DiffSingerOfflineTask + ShallowDiffusionOfflineDataset)."""
    import os

    import jax
    import numpy as np

    from bisinger_tpu.data.dataset import DataLoader, M4SingerDataset
    from bisinger_tpu.training.tasks import DiffSingerOfflineTask

    hp = tiny_env
    from bisinger_tpu.utils.text_encoder import build_phone_encoder

    vocab_size = build_phone_encoder(hp["binary_data_dir"]).vocab_size
    # record fake stage-1 mels per item
    fs2_dir = tmp_path / "fs2_mels"
    fs2_dir.mkdir()
    ds_probe = M4SingerDataset(hp, "train")
    rng_np = np.random.default_rng(0)
    for i in range(len(ds_probe)):
        it = ds_probe[i]
        np.save(
            str(fs2_dir / f"{it['item_name']}.npy"),
            rng_np.standard_normal((it["mel"].shape[0], 80)).astype(np.float32),
        )
    hp2 = hp.replace(fs2_mel_dir=str(fs2_dir), gaussian_start=False)
    ds = M4SingerDataset(hp2, "train")
    dl = DataLoader(ds, hp2, shuffle=False)
    from bisinger_tpu.training.trainer import device_batch

    batch = device_batch(next(iter(dl)))
    assert "fs2_mels" in batch and batch["fs2_mels"].shape == batch["mels"].shape

    task = DiffSingerOfflineTask(hp2, vocab_size)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    state, losses = task.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total_loss"]))
    ret = task.infer_step(state.params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(ret["mel_out"])).all()

    # fast samplers are an explicit opt-in for the offline variant
    # (reference offline always runs full-K DDPM even with pndm_speedup
    # set, shallow_diffusion_tts.py:288-319 — see PARITY.md)
    for over in (dict(pndm_speedup=2), dict(diff_sampler="dpmpp", dpm_steps=2)):
        t2 = DiffSingerOfflineTask(
            hp2.replace(offline_fast_sampler=True, **over), vocab_size
        )
        r2 = t2.infer_step(state.params, batch, jax.random.PRNGKey(3))
        assert np.isfinite(np.asarray(r2["mel_out"])).all()


def test_energy_embed_path(tiny_env):
    """use_energy_embed: energy derived from mel in the dataset, embedded
    in fs2, MSE loss trains (reference fs2_utils.py:65, fs2.py add_energy)."""
    import jax
    import numpy as np

    from bisinger_tpu.data.dataset import DataLoader, M4SingerDataset
    from bisinger_tpu.training.tasks import AuxDecoderMIDITask
    from bisinger_tpu.training.trainer import device_batch
    from bisinger_tpu.utils.text_encoder import build_phone_encoder

    hp = tiny_env.replace(use_energy_embed=True)
    vocab_size = build_phone_encoder(hp["binary_data_dir"]).vocab_size
    ds = M4SingerDataset(hp, "train")
    batch = device_batch(next(iter(DataLoader(ds, hp, shuffle=False))))
    assert "energy" in batch and batch["energy"].shape == batch["mels"].shape[:2]

    task = AuxDecoderMIDITask(hp, vocab_size)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    state, losses = task.train_step(state, batch, jax.random.PRNGKey(1))
    assert "e" in losses and np.isfinite(float(losses["e"]))  # energy MSE


def test_switch_midi2f0_curriculum(tiny_env):
    """Past switch_midi2f0_step the model stops RECEIVING gt f0/uv while
    the pitch loss keeps its targets (regression: nulling batch f0/uv
    crashed the loss; reference usr/diffsinger_task.py:391-399)."""
    import jax
    import numpy as np

    from bisinger_tpu.data.dataset import DataLoader, M4SingerDataset
    from bisinger_tpu.training.tasks import DiffSingerMIDITask
    from bisinger_tpu.training.trainer import device_batch
    from bisinger_tpu.utils.text_encoder import build_phone_encoder

    hp = tiny_env.replace(switch_midi2f0_step=2, use_pitch_embed=True)
    vocab_size = build_phone_encoder(hp["binary_data_dir"]).vocab_size
    task = DiffSingerMIDITask(hp, vocab_size)
    batch = device_batch(next(iter(DataLoader(M4SingerDataset(hp, "train"), hp))))
    state = task.init_state(jax.random.PRNGKey(0), batch)

    assert task.step_flags(1) == {"drop_f0": False}
    assert task.step_flags(5) == {"drop_f0": True}
    # post-switch step must still train with a finite pitch loss
    state, losses = task.train_step(state, batch, jax.random.PRNGKey(1), drop_f0=True)
    assert np.isfinite(float(losses["total_loss"]))
    assert "f0" in losses or "uv" in losses  # pitch supervision intact


def test_hparams_defaults_not_mutated_by_nested_override():
    """Dotted overrides must not write into the module-global defaults."""
    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.config.defaults import DEFAULT_HPARAMS

    before = DEFAULT_HPARAMS["binarization_args"]["with_wav"]
    hp = load_hparams(overrides="binarization_args.with_wav=true")
    assert hp["binarization_args"]["with_wav"] is True
    assert DEFAULT_HPARAMS["binarization_args"]["with_wav"] == before
    hp2 = load_hparams()
    assert hp2["binarization_args"]["with_wav"] == before


def test_accum_schedule_per_epoch():
    """Per-epoch grad-accumulation dict (reference
    GradientAccumulationScheduler, `pl_utils.py:256-280`): factor of the
    largest scheduled epoch <= current applies, epochs 1-indexed."""
    from bisinger_tpu.training.optim import accum_schedule

    # 10 batches/epoch; epochs 1-2 factor 1 (=20 updates), then factor 2
    every_k = accum_schedule({1: 1, 3: 2}, steps_per_epoch=10)
    assert int(every_k(0)) == 1
    assert int(every_k(19)) == 1
    assert int(every_k(20)) == 2
    assert int(every_k(10_000)) == 2

    # missing epoch 1 -> implicit {1: 1} (reference `pl_utils.py:270-271`)
    every_k = accum_schedule({4: 8}, steps_per_epoch=4)
    assert int(every_k(0)) == 1
    assert int(every_k(11)) == 1  # 3 epochs x 4 updates
    assert int(every_k(12)) == 8

    with pytest.raises(TypeError):
        accum_schedule({}, steps_per_epoch=4)
    with pytest.raises(TypeError):
        accum_schedule({1: 1.5}, steps_per_epoch=4)
    with pytest.raises(IndexError):
        accum_schedule({0: 2}, steps_per_epoch=4)


def test_accum_dict_optimizer_accumulates(tiny_env):
    """build_optimizer with a dict schedule: updates are applied only
    every k-th mini-step once past the scheduled epoch."""
    import optax

    from bisinger_tpu.training.optim import build_optimizer

    hp = tiny_env.replace(accumulate_grad_batches={1: 2})
    tx = build_optimizer(hp, schedule="rsqrt", steps_per_epoch=4)
    params = {"w": jnp.ones((3,))}
    st = tx.init(params)
    g = {"w": jnp.full((3,), 0.5)}
    up1, st = tx.update(g, st, params)  # mini-step 1 of 2: held
    assert float(jnp.abs(up1["w"]).max()) == 0.0
    up2, st = tx.update(g, st, params)  # mini-step 2 of 2: applied
    assert float(jnp.abs(up2["w"]).max()) > 0.0


def test_crf_dur_loss_rejected_for_singing(tiny_env):
    """dur_loss: crf caps durations at 31 frames (torchcrf parity) —
    singing/MIDI configs must fail loudly instead of silently clipping."""
    from bisinger_tpu.training.tasks import AuxDecoderMIDITask

    hp = tiny_env.replace(dur_loss="crf")
    with pytest.raises(ValueError, match="crf"):
        AuxDecoderMIDITask(hp, vocab_size=16)


def test_energy_convention(tiny_env):
    """Default energy matches the reference's e-based exp on the log10
    mel (`fs2_utils.py:65`); energy_convention=pow10 selects 10**mel."""
    from bisinger_tpu.data.dataset import M4SingerDataset

    hp = tiny_env.replace(use_energy_embed=True)
    ds = M4SingerDataset(hp, "train")
    s = ds[0]
    mel = s["mel"]
    ref_energy = np.sqrt((np.exp(mel) ** 2).sum(-1))
    np.testing.assert_allclose(s["energy"], ref_energy, rtol=1e-5)

    hp10 = tiny_env.replace(use_energy_embed=True, energy_convention="pow10")
    s10 = M4SingerDataset(hp10, "train")[0]
    np.testing.assert_allclose(
        s10["energy"], np.sqrt(((10.0 ** mel) ** 2).sum(-1)), rtol=1e-5
    )


def test_fs2_warm_start_from_checkpoint(tiny_env, tmp_path, capsys):
    """fs2_ckpt loads the FFT-Singer stage's weights into the diffusion
    model's fs2 subtree on a fresh run (reference
    `usr/diffsinger_task.py:64-65`); a bad path fails loudly instead of
    silently training on a random fs2."""
    from bisinger_tpu.training.tasks import DiffSingerMIDITask

    fs2_dir = str(tmp_path / "fs2_work")
    hp1 = tiny_env.replace(work_dir=fs2_dir)
    enc = build_phone_encoder(hp1["binary_data_dir"])
    fs2_state = Trainer(AuxDecoderMIDITask(hp1, enc.vocab_size), hp1).fit(
        max_updates=3
    )
    fs2_leaf = np.asarray(
        jax.device_get(fs2_state.params)["token_embed"]["embed"]["embedding"]
    )

    hp2 = tiny_env.replace(work_dir=str(tmp_path / "diff_work"), fs2_ckpt=fs2_dir)
    task = DiffSingerMIDITask(hp2, enc.vocab_size)
    trainer = Trainer(task, hp2)

    # intercept the state right after warm start: run 0 updates by
    # checking the printed line + comparing fs2 params after 1 step's
    # init path. Simplest reliable probe: warm_start_fs2 on a fresh
    # state must transplant the checkpointed leaves exactly.
    from bisinger_tpu.training.checkpoints import CheckpointManager

    raw = CheckpointManager(os.path.join(fs2_dir, "ckpt")).restore_raw()
    batch = trainer._shard(  # same init path fit() uses
        __import__("bisinger_tpu.training.trainer", fromlist=["device_batch"])
        .device_batch(next(iter(trainer.build_dataloaders()[0])))
    )
    state = task.init_state(jax.random.PRNGKey(0), batch)
    warmed = task.warm_start_fs2(state, raw["params"])
    got = np.asarray(warmed.params["fs2"]["token_embed"]["embed"]["embedding"])
    np.testing.assert_allclose(got, fs2_leaf)

    # and fit() itself reports the warm start on a fresh run
    trainer.fit(max_updates=1)
    assert "warm-started fs2" in capsys.readouterr().out

    # a configured-but-missing fs2_ckpt is a hard error
    hp3 = tiny_env.replace(
        work_dir=str(tmp_path / "diff_work2"), fs2_ckpt=str(tmp_path / "nope")
    )
    with pytest.raises(FileNotFoundError):
        Trainer(DiffSingerMIDITask(hp3, enc.vocab_size), hp3).fit(max_updates=1)


def test_freeze_mask_blocks_weight_decay(tiny_env):
    """Frozen fs2 params must not move even with weight_decay > 0:
    adamw's add_decayed_weights runs on every leaf, so the freeze mask
    has to zero updates after the optimizer too."""
    from bisinger_tpu.training.tasks import DiffSpeechTask

    hp = tiny_env.replace(weight_decay=0.01)
    enc = build_phone_encoder(hp["binary_data_dir"])
    task = DiffSpeechTask(hp, enc.vocab_size)
    ds = M4SingerDataset(hp, "train", shuffle=False)
    batch = device_batch(next(iter(DataLoader(ds, hp, shuffle=False))))
    state = task.init_state(jax.random.PRNGKey(0), batch)
    before = np.asarray(
        jax.device_get(state.params)["fs2"]["token_embed"]["embed"]["embedding"]
    )
    for i in range(2):
        state, _ = task.train_step(state, dict(batch), jax.random.PRNGKey(i))
    after = np.asarray(
        jax.device_get(state.params)["fs2"]["token_embed"]["embed"]["embedding"]
    )
    np.testing.assert_array_equal(before, after)
