"""TextGrid-aligned binarizer (reference SingingBinarizer/ZhBinarizer)."""

import json
import os

import numpy as np

from bisinger_tpu.config import load_hparams
from bisinger_tpu.data.binarizer import TextGridBinarizer
from bisinger_tpu.data.records import RecordReader

_TG_TMPL = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = {dur}
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = {dur}
        intervals: size = 4
        intervals [1]:
            xmin = 0.0
            xmax = 0.1
            text = ""
        intervals [2]:
            xmin = 0.1
            xmax = 0.3
            text = "n"
        intervals [3]:
            xmin = 0.3
            xmax = 0.6
            text = "i"
        intervals [4]:
            xmin = 0.6
            xmax = {dur}
            text = ""
"""


def _write_corpus(root, n=5):
    os.makedirs(root, exist_ok=True)
    sr = 24000
    dur_s = 0.8
    meta_lines = []
    for i in range(n):
        t = np.arange(int(sr * dur_s)) / sr
        wav = (0.3 * np.sin(2 * np.pi * (200 + 20 * i) * t)).astype(np.float32)
        wav_fn = os.path.join(root, f"it{i}.wav")
        from bisinger_tpu.utils.audio import save_wav

        save_wav(wav, wav_fn, sr)
        tg_fn = os.path.join(root, f"it{i}.TextGrid")
        with open(tg_fn, "w") as f:
            f.write(_TG_TMPL.format(dur=dur_s))
        meta_lines.append(
            {
                "item_name": f"spk0#song#{i}",
                "wav_fn": wav_fn,
                "tg_fn": tg_fn,
                "txt": "ni",
                "ph": "<SP> n i <SP>",
            }
        )
    with open(os.path.join(root, "meta.json"), "w") as f:
        for m in meta_lines:
            f.write(json.dumps(m) + "\n")


def test_textgrid_binarize(tmp_path):
    root = str(tmp_path / "raw")
    _write_corpus(root)
    hp = load_hparams(
        overrides=dict(
            raw_data_dir=root,
            raw_json_fn="meta.json",
            binary_data_dir=str(tmp_path / "bin"),
            num_spk=2,
            test_num=1,
            binarization_args={"with_f0": True, "fix_zh_dur": True},
        )
    )
    TextGridBinarizer(hp).process()
    reader = RecordReader(str(tmp_path / "bin" / "train"))
    assert len(reader) >= 3
    item = reader[0]
    mel2ph = item["mel2ph"]
    assert mel2ph.max() == 4  # four phones aligned
    # phone 2 ('n') spans ~0.1-0.3 s -> ~37 frames at hop 128 / 24 kHz
    n_frames_n = int((mel2ph == 2).sum())
    assert 20 < n_frames_n < 60
    assert "pitch_midi" not in item  # speech meta has no MIDI fields
    assert item["mel"].shape[1] == 80


def test_fix_zh_durations_rules():
    """Reference ZhBinarizer rules (binarizer_zh.py:24-50): separator
    voiced-prefix transfer + <100-frame merge, shengmu/yunmu split."""
    import numpy as np

    from bisinger_tpu.data.textgrid import fix_zh_durations

    # phones: shengmu 'n' (10 fr), yunmu 'i' (30 fr), separator ',' (20 fr)
    ph_list = ["n", "i", ","]
    mel2ph = np.concatenate([[1] * 10, [2] * 30, [3] * 20]).astype(np.int64)
    # separator's first 5 frames are voiced -> move to 'i'; remaining 15
    # frames < 100 -> merged too
    f0 = np.zeros(60, np.float32)
    f0[:40] = 200.0
    f0[40:45] = 180.0
    out = fix_zh_durations(mel2ph, ph_list, f0=f0)
    dur = np.bincount(out, minlength=4)[1:]
    assert dur[2] == 0  # separator fully absorbed
    # shengmu/yunmu equalized over their (new) total 10 + 50 = 60
    assert dur[0] == 30 and dur[1] == 30
    assert len(out) == 60


def test_speech_task_word_dur_via_silences(tmp_path):
    """Speech corpora (no word_boundary) still get a word-duration loss:
    ph_is_sil is binarized and the task dispatches to the reference's
    silence-word split (`tasks/tts/fs2.py:213-259`)."""
    import jax

    from bisinger_tpu.data.dataset import DataLoader, M4SingerDataset
    from bisinger_tpu.training.tasks import AuxDecoderMIDITask
    from bisinger_tpu.training.trainer import device_batch

    root = str(tmp_path / "raw")
    _write_corpus(root)
    hp = load_hparams(
        overrides=dict(
            raw_data_dir=root,
            raw_json_fn="meta.json",
            binary_data_dir=str(tmp_path / "bin"),
            num_spk=2,
            test_num=1,
            use_midi=False,
            use_pitch_embed=False,
            hidden_size=16,
            enc_layers=1,
            dec_layers=1,
            enc_ffn_kernel_size=3,
            dec_ffn_kernel_size=3,
            predictor_layers=1,
            dur_predictor_layers=1,
            bucket_tokens=[8],
            bucket_frames=[256],
            binarization_args={"with_f0": True},
        )
    )
    TextGridBinarizer(hp).process()
    ds = M4SingerDataset(hp, "train", shuffle=False)
    batch = device_batch(next(iter(DataLoader(ds, hp, shuffle=False))))
    assert "ph_is_sil" in batch and "word_boundary" not in batch
    task = AuxDecoderMIDITask(hp, vocab_size=16)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    losses = task.val_step(state, batch, jax.random.PRNGKey(1))
    assert "wdur" in losses and np.isfinite(float(losses["wdur"]))
