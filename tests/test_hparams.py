import os

import pytest

from bisinger_tpu.config import HParams, load_hparams
from bisinger_tpu.config.hparams import parse_overrides


def test_defaults_load():
    hp = load_hparams()
    assert hp["hidden_size"] == 256
    assert hp.audio_sample_rate == 24000
    assert hp["binarization_args"]["with_f0"] is True


def test_immutability_and_replace():
    hp = load_hparams()
    with pytest.raises(TypeError):
        hp.hidden_size = 128
    hp2 = hp.replace(hidden_size=128)
    assert hp2.hidden_size == 128 and hp.hidden_size == 256


def test_hashable():
    hp = load_hparams()
    assert hash(hp) == hash(hp.replace())
    assert hash(hp) != hash(hp.replace(hidden_size=1))


def test_yaml_cascade(tmp_path):
    (tmp_path / "base.yaml").write_text("a: 1\nb: {x: 1, y: 2}\n")
    (tmp_path / "mid.yaml").write_text("base_config: ./base.yaml\nb: {y: 3}\nc: 7\n")
    (tmp_path / "exp.yaml").write_text(
        "base_config:\n  - ./mid.yaml\na: 9\n"
    )
    hp = load_hparams(str(tmp_path / "exp.yaml"), base={})
    assert hp["a"] == 9  # child overrides
    assert hp["b"]["x"] == 1 and hp["b"]["y"] == 3  # recursive merge
    assert hp["c"] == 7


def test_cli_overrides():
    hp = load_hparams(overrides="hidden_size=512,lr=0.5,use_uv=false")
    assert hp.hidden_size == 512
    assert hp.lr == 0.5
    assert hp.use_uv is False


def test_parse_overrides_protects_brackets():
    d = parse_overrides("a=[1,2,3],b=2")
    assert d == {"a": "[1,2,3]", "b": "2"}


def test_cycle_detection(tmp_path):
    (tmp_path / "a.yaml").write_text("base_config: ./b.yaml\n")
    (tmp_path / "b.yaml").write_text("base_config: ./a.yaml\n")
    with pytest.raises(ValueError):
        load_hparams(str(tmp_path / "a.yaml"), base={})


def test_shipped_config_tree():
    """Every shipped experiment config resolves through its base_config
    chain to a complete HParams tree."""
    import glob
    import os

    from bisinger_tpu.config import load_hparams

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    paths = sorted(glob.glob(os.path.join(root, "**", "*.yaml"), recursive=True))
    assert len(paths) >= 10
    for p in paths:
        hp = load_hparams(p)
        assert hp["audio_num_mel_bins"] == 80, p

    flagship = load_hparams(
        os.path.join(root, "usr", "m4-detect-ori-shift", "diff.yaml")
    )
    # diff.yaml < base.yaml < singing/fs2.yaml < tts/fs2.yaml < tts/base.yaml
    # < config_base.yaml, with child-overrides-parent at every level
    assert flagship["task_cls"].endswith("DiffSingerMIDITask")
    assert flagship["hop_size"] == 128  # singing/base overrides tts/base 256
    assert flagship["audio_sample_rate"] == 24000
    assert flagship["K_step"] == 1000 and flagship["pndm_speedup"] == 5
    assert flagship["num_spk"] == 21
    assert flagship["mel_loss"] == "l1:0.5|ssim:0.5"  # inherited from tts/fs2


def test_explicit_keys_exclude_base_config_inheritance(tmp_path):
    """_explicit_keys provenance: keys from the NAMED file or an override
    are explicit; keys inherited via base_config (e.g. the shipped
    tts/base.yaml rsqrt-scale `lr: 2.0`) are that config's defaults.
    Regression: counting cascade keys as explicit disabled the lr=2.0
    step-decay substitution for every config built on the standard
    cascade, and the diffusion stage diverged in 2 steps."""
    from bisinger_tpu.config import load_hparams

    (tmp_path / "base.yaml").write_text("lr: 2.0\nfoo: 1\n")
    (tmp_path / "exp.yaml").write_text("base_config: base.yaml\nbar: 2\n")

    hp = load_hparams(str(tmp_path / "exp.yaml"))
    assert hp["lr"] == 2.0 and hp["foo"] == 1
    assert "bar" in hp["_explicit_keys"]
    assert "lr" not in hp["_explicit_keys"]
    assert "foo" not in hp["_explicit_keys"]
    assert "base_config" not in hp["_explicit_keys"]

    hp2 = load_hparams(str(tmp_path / "exp.yaml"), overrides="lr=2.0")
    assert "lr" in hp2["_explicit_keys"]

    (tmp_path / "exp2.yaml").write_text("base_config: base.yaml\nlr: 2.0\n")
    hp3 = load_hparams(str(tmp_path / "exp2.yaml"))
    assert "lr" in hp3["_explicit_keys"]


def test_step_decay_substitution_applies_to_shipped_cascade():
    """A user config inheriting the standard cascade (lr 2.0 from
    tts/base.yaml) but running the step-decay (diffusion) schedule gets
    the reference diffusion default 0.001, not the raw rsqrt scale —
    while the flagship diff.yaml's own `lr: 0.001` is untouched."""
    import os

    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.training.optim import step_decay_schedule

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    hp = load_hparams(os.path.join(root, "usr", "m4-detect-ori-shift", "base.yaml"))
    assert hp["lr"] == 2.0 and "lr" not in hp["_explicit_keys"]
    sched = step_decay_schedule(hp)
    assert abs(float(sched(0)) - 0.001) < 1e-9

    flagship = load_hparams(
        os.path.join(root, "usr", "m4-detect-ori-shift", "diff.yaml")
    )
    assert flagship["lr"] == 0.001 and "lr" in flagship["_explicit_keys"]
    assert abs(float(step_decay_schedule(flagship)(0)) - 0.001) < 1e-9


def test_replace_records_provenance(tmp_path):
    """hp.replace(lr=2.0) is as deliberate as a config-file set — the
    replaced key must land in _explicit_keys so the step-decay lr=2.0
    substitution (training/optim.py) does not override a programmatic
    choice. Regression for the review finding that replace() bypassed
    provenance entirely."""
    from bisinger_tpu.config import load_hparams

    (tmp_path / "base.yaml").write_text("lr: 2.0\n")
    (tmp_path / "exp.yaml").write_text("base_config: base.yaml\n")
    hp = load_hparams(str(tmp_path / "exp.yaml"))
    assert "lr" not in hp["_explicit_keys"]

    hp2 = hp.replace(lr=2.0)
    assert "lr" in hp2["_explicit_keys"]
    # untouched keys keep their provenance; the original is unchanged
    assert "lr" not in hp["_explicit_keys"]


def test_non_mapping_config_rejected(tmp_path):
    """A YAML whose top level is a list (not a mapping) must fail with a
    clear error, not an AttributeError deep in the merge."""
    import pytest

    from bisinger_tpu.config import load_hparams

    (tmp_path / "bad.yaml").write_text("- just\n- a\n- list\n")
    with pytest.raises(ValueError, match="top level must be a mapping"):
        load_hparams(str(tmp_path / "bad.yaml"))
