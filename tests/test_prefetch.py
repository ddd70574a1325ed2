"""Async input pipeline: Prefetcher unit behavior + trainer equivalence."""

import time

import jax
import numpy as np
import pytest

from bisinger_tpu.data.prefetch import Prefetcher


class TestPrefetcher:
    def test_preserves_order_and_applies_transform(self):
        src = list(range(100))
        out = list(Prefetcher(iter(src), depth=4, transform=lambda x: x * 2))
        assert out == [x * 2 for x in src]

    def test_propagates_exceptions(self):
        def gen():
            yield 1
            raise ValueError("boom")

        it = Prefetcher(gen(), depth=2)
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            next(it)

    def test_transform_exception_propagates(self):
        def bad(x):
            if x == 3:
                raise RuntimeError("transform died")
            return x

        it = Prefetcher(iter(range(10)), depth=2, transform=bad)
        assert [next(it), next(it), next(it)] == [0, 1, 2]
        with pytest.raises(RuntimeError, match="transform died"):
            list(it)

    def test_close_stops_endless_source(self):
        def endless():
            i = 0
            while True:
                yield i
                i += 1

        it = Prefetcher(endless(), depth=2)
        assert next(it) == 0
        it.close()
        # worker must exit promptly even though the source never ends
        it._thread.join(timeout=5.0)
        assert not it._thread.is_alive()

    def test_actually_overlaps(self):
        """With depth 2, slow production overlaps slow consumption: the
        wall clock is ~max(produce, consume), not the sum."""
        def slow_gen():
            for i in range(6):
                time.sleep(0.05)
                yield i

        t0 = time.time()
        for _ in Prefetcher(slow_gen(), depth=2):
            time.sleep(0.05)  # consumer work
        overlapped = time.time() - t0
        # serial would be >= 0.6; overlapped should be well under
        assert overlapped < 0.50, overlapped

    def test_exhaustion_is_latched(self):
        """A finite source raises StopIteration REPEATEDLY: the _STOP
        sentinel is consumed exactly once, so without the latch a second
        next() would block forever on the drained queue."""
        p = Prefetcher(iter([1, 2]), depth=2)
        assert list(p) == [1, 2]
        for _ in range(3):
            with pytest.raises(StopIteration):
                next(p)

    def test_context_manager(self):
        with Prefetcher(iter([1, 2, 3]), depth=1) as it:
            assert next(it) == 1


def test_trainer_prefetch_equivalence(tmp_path):
    """dataloader_prefetch=2 (default) and =0 (synchronous) must produce
    bit-identical training trajectories — the feeder changes WHERE the
    work happens, never WHAT is fed."""
    from bisinger_tpu.config import load_hparams
    from bisinger_tpu.data.binarizer import M4SingerBinarizer
    from bisinger_tpu.data.synthetic import make_synthetic_corpus
    from bisinger_tpu.training.tasks import AuxDecoderMIDITask
    from bisinger_tpu.training.trainer import Trainer
    from bisinger_tpu.utils.text_encoder import build_phone_encoder

    raw = str(tmp_path / "raw")
    make_synthetic_corpus(raw, n_items=6, seed=0)
    base = dict(
        raw_data_dir=raw,
        raw_json_fn="meta.json",
        binary_data_dir=str(tmp_path / "binary"),
        num_spk=4,
        test_prefixes=["Alto-1#song0"],
        pitch_extractor="autocorr",
        hidden_size=16,
        enc_layers=1,
        dec_layers=1,
        enc_ffn_kernel_size=3,
        dec_ffn_kernel_size=3,
        predictor_layers=2,
        dur_predictor_layers=2,
        use_pitch_embed=False,
        bucket_tokens=[32],
        bucket_frames=[256],
        max_tokens=4000,
        max_sentences=4,
        max_words=32,
        log_interval=2,
        val_check_interval=100,
        num_sanity_val_steps=0,
        warmup_updates=2,
        lr=1e-3,
        clip_grad_norm=1.0,
        save_codes=False,
        save_ckpt=False,
    )
    hp0 = load_hparams(overrides=base)
    M4SingerBinarizer(hp0).process()
    vocab = build_phone_encoder(hp0["binary_data_dir"]).vocab_size

    final = {}
    # consumer-thread H2D (default), worker-thread H2D, and synchronous
    # feeding must all produce bit-identical trajectories
    for depth, put in ((2, "main"), (2, "worker"), (0, "main")):
        hp = load_hparams(
            overrides=dict(
                base,
                dataloader_prefetch=depth,
                dataloader_prefetch_put=put,
                work_dir=str(tmp_path / f"work{depth}{put}"),
            )
        )
        task = AuxDecoderMIDITask(hp, vocab)
        tr = Trainer(task, hp)
        state = tr.fit(max_updates=4)
        final[depth, put] = np.asarray(
            jax.device_get(
                jax.tree_util.tree_leaves(state.params)[0]
            )
        )
    np.testing.assert_array_equal(final[2, "main"], final[0, "main"])
    np.testing.assert_array_equal(final[2, "worker"], final[0, "main"])
