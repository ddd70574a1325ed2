"""Sequence (temporal) parallelism — long-form synthesis exactness.

Shards the mel-frame axis over a ('data', 'seq') mesh
(parallel/sequence.py) and checks, on the virtual 8-device CPU mesh,
that GSPMD's spatial partitioning of the synth path (fs2 -> diffusion
sampling scan -> PE -> NSF HiFi-GAN) reproduces the unsharded outputs:
the inserted conv halo exchanges and attention gathers must be exact
up to fp reassociation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _batch, _tiny_hp
from bisinger_tpu.parallel import (
    make_seq_mesh,
    shard_longform_batch,
    time_spec,
)
from bisinger_tpu.training.tasks import DiffSingerMIDITask

VOCAB = 32


@pytest.fixture(scope="module")
def env():
    hp = _tiny_hp()
    task = DiffSingerMIDITask(hp, VOCAB)
    batch = _batch(2, 16, 64, VOCAB)
    rng = jax.random.PRNGKey(0)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    return hp, task, batch, rng, state.params


def test_seq_mesh_construction():
    mesh = make_seq_mesh(num_seq=4, num_data=2)
    assert mesh.shape == {"data": 2, "seq": 4}
    mesh_all = make_seq_mesh()  # pure long-form: all devices on 'seq'
    assert mesh_all.shape == {"data": 1, "seq": 8}


def test_time_spec_ranks():
    assert time_spec(2, "seq") == jax.sharding.PartitionSpec(None, "seq")
    assert time_spec(3, "seq") == jax.sharding.PartitionSpec(None, "seq", None)


def test_longform_sampling_matches_unsharded(env):
    """Full infer (durations -> PLMS scan -> mel) with frames sharded
    over 'seq' == the single-device result."""
    hp, task, batch, rng, params = env
    ref = task.infer_step(params, batch, rng)
    ref_mel = np.asarray(ref["mel_out"])

    hp_sp = hp.replace(sequence_parallel_axis="seq")
    task_sp = DiffSingerMIDITask(hp_sp, VOCAB)
    mesh = make_seq_mesh(num_seq=4, num_data=2)
    with mesh:
        sharded = shard_longform_batch(batch, mesh)
        ret = task_sp.infer_step(params, sharded, rng)
        sp_mel = np.asarray(jax.device_get(ret["mel_out"]))
        # the constraint must actually take: mel_out is not replicated
        assert not ret["mel_out"].sharding.is_fully_replicated

    assert sp_mel.shape == ref_mel.shape
    np.testing.assert_allclose(sp_mel, ref_mel, rtol=1e-4, atol=1e-4)


def test_longform_vocoder_matches_unsharded():
    """NSF HiFi-GAN with mel frames + harmonic source sharded over 'seq'
    == unsharded waveform (halo exchange through every upsample/MRF
    stage)."""
    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.models.hifigan import HifiGanGenerator

    over = dict(
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        upsample_initial_channel=16,
        resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]],
        use_nsf=True,
        hop_size=16,
        compute_dtype="float32",
    )
    hp = load_hparams(overrides=over)
    hp_sp = hp.replace(sequence_parallel_axis="seq")
    B, T = 2, 64
    r = np.random.RandomState(0)
    mel = jnp.asarray(r.randn(B, T, 80).astype(np.float32))
    f0 = jnp.asarray(np.abs(r.randn(B, T)).astype(np.float32) * 100 + 100)
    rng = jax.random.PRNGKey(1)

    voc = HifiGanGenerator(hp=hp)
    params = voc.init(jax.random.PRNGKey(0), mel, f0, rng)["params"]
    ref = np.asarray(voc.apply({"params": params}, mel, f0, rng))

    voc_sp = HifiGanGenerator(hp=hp_sp)
    mesh = make_seq_mesh(num_seq=4, num_data=2)
    with mesh:
        mel_s = jax.device_put(
            mel, jax.sharding.NamedSharding(mesh, time_spec(3, "seq"))
        )
        f0_s = jax.device_put(
            f0, jax.sharding.NamedSharding(mesh, time_spec(2, "seq"))
        )
        out = jax.jit(
            lambda p, m, f: voc_sp.apply({"params": p}, m, f, rng)
        )(params, mel_s, f0_s)
        wav = np.asarray(jax.device_get(out))

    assert wav.shape == ref.shape
    np.testing.assert_allclose(wav, ref, rtol=1e-4, atol=1e-5)


def test_longform_pe_matches_unsharded():
    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.models.pe import PitchExtractor

    # fp32: exact sharded == unsharded comparison (bf16 flips borderline
    # uv>0 gates between layouts)
    hp = load_hparams(
        overrides=dict(predictor_hidden=32, compute_dtype="float32")
    )
    hp_sp = hp.replace(sequence_parallel_axis="seq")
    B, T = 2, 64
    mel = jnp.asarray(np.random.RandomState(0).randn(B, T, 80).astype(np.float32))

    pe = PitchExtractor(hp=hp)
    variables = pe.init(jax.random.PRNGKey(0), mel)
    ref = pe.apply(variables, mel)
    ref_f0 = np.asarray(ref["f0_denorm_pred"])

    pe_sp = PitchExtractor(hp=hp_sp)
    mesh = make_seq_mesh(num_seq=4, num_data=2)
    with mesh:
        mel_s = jax.device_put(
            mel, jax.sharding.NamedSharding(mesh, time_spec(3, "seq"))
        )
        out = jax.jit(lambda v, m: pe_sp.apply(v, m))(variables, mel_s)
        sp_f0 = np.asarray(jax.device_get(out["f0_denorm_pred"]))

    np.testing.assert_allclose(sp_f0, ref_f0, rtol=1e-4, atol=1e-3)


def test_shard_longform_batch_layout():
    batch = _batch(2, 16, 64, VOCAB)
    mesh = make_seq_mesh(num_seq=4, num_data=2)
    out = shard_longform_batch(batch, mesh)
    # frame-level arrays: sharded over data x seq
    assert not out["mels"].sharding.is_fully_replicated
    assert out["mels"].sharding.spec[1] == "seq"
    # token-level arrays: batch axis only
    assert out["txt_tokens"].sharding.spec == jax.sharding.PartitionSpec("data")
