"""Data layer tests: text frontend, record schemas, bucketing, synthetic corpus."""

import numpy as np
import pytest

from self_attention_tacotron_tpu.data import dataset as ds
from self_attention_tacotron_tpu.data.corpus import write_selected_lists
from self_attention_tacotron_tpu.data.dataset_factory import dataset_factory
from self_attention_tacotron_tpu.data.synthetic import generate_corpus
from self_attention_tacotron_tpu.hparams import HParams
from self_attention_tacotron_tpu.text import english, japanese, text_to_sequence, sequence_to_text


# ------------------------------ text ------------------------------ #


def test_text_roundtrip():
    seq = text_to_sequence("Hello, World!")
    assert seq[-1] == 1  # EOS
    assert sequence_to_text(seq[:-1]) == "hello, world!"


def test_number_expansion():
    assert english.spell_number(0) == "zero"
    assert english.spell_number(21) == "twenty one"
    assert english.spell_number(105) == "one hundred five"
    assert english.spell_number(1234) == "one thousand two hundred thirty four"
    assert english.english_cleaners("I have 2 cats") == "i have two cats"


def test_abbreviation_expansion():
    assert english.english_cleaners("Dr. Smith") == "doctor smith"
    assert english.english_cleaners("Mr. and Mrs.") == "mister and misess"


def test_japanese_accent_encoding():
    hp = HParams()
    seq = japanese.phoneme_to_sequence(["k", "a", "N"])
    assert len(seq) == 4 and seq[-1] == japanese.EOS_ID
    acc = japanese.encode_accent_types([0, 1, 2], hp.accent_type_offset, hp.accent_type_unknown)
    assert acc[0] == hp.accent_type_offset
    assert acc[-1] == hp.accent_type_unknown


# --------------------------- batch helpers --------------------------- #


def test_done_targets():
    done = ds.make_done_targets(5, 8)
    np.testing.assert_array_equal(done, [0, 0, 0, 0, 1, 1, 1, 1])


def test_pad_to_multiple():
    x = np.ones((5, 3))
    y = ds.pad_to_multiple(x, 4)
    assert y.shape == (8, 3)
    np.testing.assert_array_equal(y[5:], 0)
    assert ds.pad_to_multiple(np.ones((4, 3)), 4).shape == (4, 3)


def test_selected_lists(tmp_path):
    write_selected_lists(str(tmp_path), [f"u{i}" for i in range(20)])
    train = ds.read_selected_list(str(tmp_path), "train")
    val = ds.read_selected_list(str(tmp_path), "validation")
    test = ds.read_selected_list(str(tmp_path), "test")
    assert len(train) + len(val) + len(test) == 20
    assert not (set(train) & set(val)) and not (set(train) & set(test))


# --------------------------- full pipeline --------------------------- #


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    hp = HParams(sample_rate=8000, num_freq=257, frame_length_ms=32, frame_shift_ms=16)
    ids = generate_corpus(
        str(root), hp, num_utterances=12, selected_list_dir=str(root / "lists")
    )
    return root, hp, ids


def test_synthetic_corpus_files(corpus):
    root, hp, ids = corpus
    assert len(ids) == 12
    src = ds.parse_source_tfrecord(str(root / f"{ids[0]}.source.tfrecord"))
    tgt = ds.parse_target_tfrecord(str(root / f"{ids[0]}.target.tfrecord"))
    assert src.id == tgt.id == ids[0]
    assert src.source_length == len(src.source)
    assert tgt.mel.shape == (tgt.target_length, hp.num_mels)
    assert 0.0 <= tgt.mel.min() and tgt.mel.max() <= 1.0


def test_dataset_batching_static_shapes(corpus):
    root, hp, ids = corpus
    data = ds.TacotronDataset(str(root), str(root), hp)
    batches = list(data.batches(4, shuffle=True, repeat=False, seed=0))
    assert sum(b["source"].shape[0] for b in batches) >= 12
    for b in batches:
        B, S = b["source"].shape
        assert B == 4
        assert S % ds.TacotronDataset.SOURCE_BUCKET_QUANT == 0
        T = b["mel"].shape[1]
        assert T % hp.outputs_per_step == 0
        # lengths are within padded shapes and multiples of r
        assert (b["target_lengths"] <= T).all()
        assert (b["target_lengths"] % hp.outputs_per_step == 0).all()
        assert (b["source_lengths"] <= S).all()
        # done is 1 at the padded tail, 0 at the start of valid audio
        np.testing.assert_array_equal(b["done"][:, -1], 1.0)
        assert (b["done"][:, 0] == 0).all()


def test_dataset_selected_list_filtering(corpus):
    root, hp, ids = corpus
    train_ids = ds.read_selected_list(str(root / "lists"), "train")
    data = ds.TacotronDataset(str(root), str(root), hp, utterance_ids=train_ids)
    assert set(data.ids) == set(train_ids)
    with pytest.raises(FileNotFoundError):
        ds.TacotronDataset(str(root), str(root), hp, utterance_ids=["nope"])


def test_dataset_repeat_and_prefetch(corpus):
    root, hp, ids = corpus
    data = ds.TacotronDataset(str(root), str(root), hp)
    it = data.batches(4, shuffle=True, repeat=True, prefetch=2, seed=1)
    seen = [next(it) for _ in range(7)]  # more than one epoch of full batches
    assert all(b["mel"].shape[0] == 4 for b in seen)


def test_dataset_eval_pads_incomplete_batch(corpus):
    root, hp, ids = corpus
    data = ds.TacotronDataset(str(root), str(root), hp)
    batches = list(data.batches(5, shuffle=False, repeat=False, drop_incomplete=False))
    assert sum(1 for _ in batches) == 3  # 12 utts → 2 full + 1 padded
    assert all(b["source"].shape[0] == 5 for b in batches)


def test_dataset_factory():
    assert dataset_factory("ljspeech").__name__ == "LJSpeech"
    assert dataset_factory("VCTK").__name__ == "VCTK"
    assert dataset_factory("japanese").__name__ == "JapanesePitchAccent"
    with pytest.raises(ValueError):
        dataset_factory("unknown")


def test_cache_file_roundtrip(tmp_path):
    """cache_file_name persists the parsed corpus as one pickle (wired r2)."""
    from self_attention_tacotron_tpu.data.synthetic import generate_corpus
    from self_attention_tacotron_tpu.data.dataset import TacotronDataset
    import os
    from tests.test_models import tiny_hparams

    hp = tiny_hparams(sample_rate=8000, num_freq=129, frame_length_ms=32,
                      frame_shift_ms=16, use_cache=True,
                      cache_file_name=str(tmp_path / "corpus.cache"))
    root = str(tmp_path / "corpus")
    generate_corpus(root, hp, num_utterances=4, min_symbols=4, max_symbols=6)
    data = TacotronDataset(root, root, hp)
    data.save_file_cache()
    assert os.path.exists(hp.cache_file_name)

    # a fresh dataset loads from the cache file without touching tfrecords
    data2 = TacotronDataset(root, root, hp)
    assert set(data2._cache.keys()) == set(data.ids)
    import numpy as np
    a = data.load_utterance(data.ids[0])[1].mel
    b = data2._cache[data.ids[0]][1].mel
    np.testing.assert_array_equal(a, b)
