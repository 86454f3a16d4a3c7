"""TFRecord + Example codec tests, including byte-level cross-check vs TF."""

import numpy as np
import pytest

from self_attention_tacotron_tpu.utils import tfrecord as tfr


def test_crc32c_known_vectors():
    # published CRC32C test vectors (RFC 3720 / golang hash tests)
    assert tfr.crc32c(b"") == 0x00000000
    assert tfr.crc32c(b"a") == 0xC1D04330
    assert tfr.crc32c(b"123456789") == 0xE3069283


def test_varint_roundtrip():
    for n in [0, 1, 127, 128, 300, 2**32, 2**63 - 1]:
        v, pos = tfr._read_varint(tfr._varint(n), 0)
        assert v == n


def test_records_roundtrip(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    recs = [b"hello", b"", b"x" * 1000]
    tfr.write_records(path, recs)
    assert list(tfr.read_records(path)) == recs


def test_example_roundtrip():
    feats = {
        "id": b"LJ001-0001",
        "text": "printing, then",
        "source": np.array([4, 5, 6], np.int64),
        "mel": np.linspace(0, 1, 7, dtype=np.float32),
        "neg": np.array([-3, -1], np.int64),
    }
    data = tfr.encode_example(feats)
    out = tfr.decode_example(data)
    assert out["id"] == b"LJ001-0001"
    assert out["text"] == b"printing, then"
    np.testing.assert_array_equal(out["source"], feats["source"])
    np.testing.assert_allclose(out["mel"], feats["mel"])
    np.testing.assert_array_equal(out["neg"], feats["neg"])


def test_example_file_roundtrip(tmp_path):
    path = str(tmp_path / "u.source.tfrecord")
    tfr.write_example_file(path, {"source": np.arange(5, dtype=np.int64)})
    out = tfr.read_example_file(path)
    np.testing.assert_array_equal(out["source"], np.arange(5))


@pytest.mark.filterwarnings("ignore")
def test_cross_compat_with_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")

    feats = {
        "id": b"utt1",
        "source": np.array([1, 2, 300], np.int64),
        "mel": np.array([0.5, -1.25, 3.0], np.float32),
    }
    # ours → TF parses
    ours = tfr.encode_example(feats)
    ex = tf.train.Example.FromString(ours)
    assert ex.features.feature["id"].bytes_list.value[0] == b"utt1"
    assert list(ex.features.feature["source"].int64_list.value) == [1, 2, 300]
    np.testing.assert_allclose(
        list(ex.features.feature["mel"].float_list.value), feats["mel"]
    )

    # TF → ours parses
    ex2 = tf.train.Example(
        features=tf.train.Features(
            feature={
                "id": tf.train.Feature(bytes_list=tf.train.BytesList(value=[b"utt2"])),
                "source": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[9, 8, -7])
                ),
                "mel": tf.train.Feature(
                    float_list=tf.train.FloatList(value=[1.5, 2.5])
                ),
            }
        )
    )
    out = tfr.decode_example(ex2.SerializeToString())
    assert out["id"] == b"utt2"
    np.testing.assert_array_equal(out["source"], [9, 8, -7])
    np.testing.assert_allclose(out["mel"], [1.5, 2.5])

    # TFRecord container cross-read: TF writes, we read
    path = str(tmp_path / "tfwrote.tfrecord")
    with tf.io.TFRecordWriter(path) as w:
        w.write(ex2.SerializeToString())
    recs = list(tfr.read_records(path))
    assert len(recs) == 1
    assert tfr.decode_example(recs[0])["id"] == b"utt2"

    # we write, TF reads
    path2 = str(tmp_path / "wewrote.tfrecord")
    tfr.write_records(path2, [ours])
    got = list(tf.data.TFRecordDataset(path2).as_numpy_iterator())
    assert got == [ours]
