import json

import pytest

from self_attention_tacotron_tpu.hparams import HParams, default_hparams


def test_defaults_roundtrip_json(tmp_path):
    hp = default_hparams()
    path = tmp_path / "hp.json"
    path.write_text(hp.to_json())
    hp2 = HParams().override_from_json_file(str(path))
    assert hp2.values() == hp.values()


def test_parse_overrides_types():
    hp = HParams()
    hp.parse(
        "batch_size=8,initial_learning_rate=0.001,use_accent_type=true,"
        "tacotron_model=ExtendedTacotronV1Model,decoder_prenet_out_units=256+128+64"
    )
    assert hp.batch_size == 8
    assert hp.initial_learning_rate == pytest.approx(0.001)
    assert hp.use_accent_type is True
    assert hp.tacotron_model == "ExtendedTacotronV1Model"
    assert hp.decoder_prenet_out_units == (256, 128, 64)


def test_parse_rejects_unknown_key():
    with pytest.raises(ValueError):
        HParams().parse("not_a_real_hparam=1")


def test_parse_empty_is_noop():
    hp = HParams()
    before = hp.values()
    hp.parse(None)
    hp.parse("")
    assert hp.values() == before


def test_derived_audio_quantities():
    hp = HParams()
    assert hp.n_fft == 2048
    assert hp.hop_length == 275  # 12.5 ms @ 22050
    assert hp.win_length == 1102  # 50 ms @ 22050
    assert hp.fmax == pytest.approx(11025.0)


def test_values_is_json_serializable():
    json.dumps(HParams().values())


def test_parse_empty_tuple_default_infers_float():
    """Regression (ADVICE r1): CLI overrides of empty-default float tuples
    must not crash; element type is inferred from the string."""
    hp = HParams(num_mels=2).parse("average_mel_level_db=-1.5+-2.0")
    assert hp.average_mel_level_db == (-1.5, -2.0)
    hp2 = HParams().parse("mesh_shape=4+2")
    assert hp2.mesh_shape == (4, 2)
    assert all(isinstance(v, int) for v in hp2.mesh_shape)
