"""End-to-end model family tests: init, teacher-forced forward, loss, predict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_attention_tacotron_tpu.hparams import HParams
from self_attention_tacotron_tpu.models.decoders import Decoder
from self_attention_tacotron_tpu.models.attention import attention_factory
from self_attention_tacotron_tpu.models.models import (
    TacotronNetwork,
    tacotron_model_factory,
)
from self_attention_tacotron_tpu.synthesis import make_predict_fn


def tiny_hparams(**kw) -> HParams:
    hp = HParams(
        num_symbols=30,
        embedding_dim=16,
        encoder_prenet_out_units=(16, 8),
        encoder_out_units=16,
        cbhg_out_units=16,
        conv_channels=8,
        max_filter_width=4,
        projection1_out_channels=8,
        projection2_out_channels=8,
        num_highway=2,
        self_attention_out_units=16,
        self_attention_num_heads=2,
        self_attention_num_hop=1,
        self_attention_transformer_ffn_units=32,
        decoder_prenet_out_units=(16, 8),
        attention_out_units=16,
        attention1_out_units=12,
        attention2_out_units=8,
        decoder_out_units=16,
        decoder_self_attention_out_units=16,
        decoder_self_attention_num_heads=2,
        num_mels=10,
        num_mgcs=6,
        num_lf0s=8,
        outputs_per_step=2,
        max_iters=12,
        num_speakers=4,
        speaker_embedding_dim=4,
        num_accent_type=5,
        accent_type_offset=0,
        accent_type_embedding_dim=4,
    )
    for k, v in kw.items():
        setattr(hp, k, v)
    return hp


def _batch(hp, B=2, S=11, T=8):
    heads = {"mel": hp.num_mels, "mgc": hp.num_mgcs, "lf0": hp.num_lf0s}
    batch = {
        "source": jnp.ones((B, S), jnp.int32),
        "source_lengths": jnp.array([S, S - 4]),
        "target_lengths": jnp.array([T, T - 2]),
        "done": (jnp.arange(T)[None, :] >= jnp.array([T, T - 2])[:, None] - 1).astype(
            jnp.float32
        ),
        "mel": jax.random.uniform(jax.random.PRNGKey(5), (B, T, heads["mel"])),
        "mgc": jax.random.uniform(jax.random.PRNGKey(6), (B, T, heads["mgc"])),
        "lf0": jnp.zeros((B, T), jnp.int32),
        "accent_type": jnp.zeros((B, S), jnp.int32),
        "speaker_id": jnp.array([0, 2]),
    }
    return batch


def _init_and_forward(model, batch):
    net = model.network(is_training=True)
    hp = model.hparams
    targets = (
        batch["mel"]
        if model.HEADS == ("mel",)
        else jnp.concatenate(
            [batch["mgc"], jax.nn.one_hot(batch["lf0"], hp.num_lf0s)], axis=-1
        )
    )
    kwargs = {}
    if hp.use_accent_type:
        kwargs["accent_type"] = batch["accent_type"]
    if hp.use_speaker_embedding:
        kwargs["speaker_id"] = batch["speaker_id"]
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "zoneout": jax.random.PRNGKey(2),
    }
    variables = net.init(
        rngs, batch["source"], batch["source_lengths"], targets,
        batch["target_lengths"], **kwargs,
    )
    out, _ = net.apply(
        variables,
        batch["source"],
        batch["source_lengths"],
        targets,
        batch["target_lengths"],
        rngs={"dropout": jax.random.PRNGKey(3), "zoneout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
        **kwargs,
    )
    return net, variables, out, targets


@pytest.mark.parametrize(
    "model_name,encoder,decoder",
    [
        ("ExtendedTacotronV1Model", "ZoneoutEncoderV1", "ExtendedDecoder"),
        ("ExtendedTacotronV1Model", "EncoderV1", "ExtendedDecoder"),
        ("DualSourceSelfAttentionTacotronModel", "SelfAttentionCBHGEncoder", "DualSourceDecoder"),
        (
            "DualSourceSelfAttentionTacotronModel",
            "SelfAttentionCBHGEncoder",
            "DualSourceSelfAttentionDecoder",
        ),
        ("MgcLf0TacotronModel", "ZoneoutEncoderV1", "MgcLf0ExtendedDecoder"),
        (
            "DualSourceSelfAttentionMgcLf0TacotronModel",
            "SelfAttentionCBHGEncoder",
            "MgcLf0DualSourceSelfAttentionDecoder",
        ),
    ],
)
def test_model_families_forward_and_loss(model_name, encoder, decoder):
    hp = tiny_hparams(tacotron_model=model_name, encoder=encoder, decoder=decoder)
    model = tacotron_model_factory(hp)
    batch = _batch(hp)
    net, variables, out, targets = _init_and_forward(model, batch)
    T = batch["mel"].shape[1]
    for head in model.HEADS:
        dim = model.head_dims()[head]
        assert out.frames[head].shape == (2, T, dim)
    assert out.stop_logits.shape == (2, T)
    losses = model.loss(out, batch, params=variables["params"])
    assert np.isfinite(float(losses["loss"]))
    assert float(losses["loss"]) > 0


@pytest.mark.parametrize("use_accent,use_speaker", [(True, False), (False, True), (True, True)])
def test_conditioning_variants(use_accent, use_speaker):
    hp = tiny_hparams(
        tacotron_model="DualSourceSelfAttentionTacotronModel",
        encoder="SelfAttentionCBHGEncoderWithAccentType"
        if use_accent
        else "SelfAttentionCBHGEncoder",
        decoder="DualSourceDecoder",
        use_accent_type=use_accent,
        use_speaker_embedding=use_speaker,
    )
    model = tacotron_model_factory(hp)
    batch = _batch(hp)
    net, variables, out, _ = _init_and_forward(model, batch)
    assert out.frames["mel"].shape == (2, 8, hp.num_mels)


def test_postnets_produce_outputs():
    hp = tiny_hparams(
        tacotron_model="ExtendedTacotronV1Model",
        encoder="ZoneoutEncoderV1",
        use_postnet_v2=True,
        use_linear_spectrogram_postnet=True,
        postnet_v2_num_layers=2,
        postnet_v2_out_channels=8,
        num_freq=33,
    )
    model = tacotron_model_factory(hp)
    batch = _batch(hp)
    batch["spec"] = jax.random.uniform(jax.random.PRNGKey(7), (2, 8, 33))
    net, variables, out, _ = _init_and_forward(model, batch)
    assert out.postnet_frames.shape == (2, 8, hp.num_mels)
    assert out.linear_frames.shape == (2, 8, 33)
    losses = model.loss(out, batch)
    assert "postnet_loss" in losses and "linear_loss" in losses


def test_predict_runs_and_shapes():
    hp = tiny_hparams(
        tacotron_model="DualSourceSelfAttentionTacotronModel",
        encoder="SelfAttentionCBHGEncoder",
        decoder="DualSourceSelfAttentionDecoder",
    )
    model = tacotron_model_factory(hp)
    batch = _batch(hp)
    net, variables, out, _ = _init_and_forward(model, batch)
    predict = make_predict_fn(model)
    res = predict(
        variables,
        {"source": batch["source"], "source_lengths": batch["source_lengths"]},
        jax.random.PRNGKey(0),
    )
    max_frames = hp.max_iters * hp.outputs_per_step
    assert res["mel"].shape == (2, max_frames, hp.num_mels)
    assert res["lengths"].shape == (2,)
    assert all(a.shape == (2, hp.max_iters, 11) for a in res["alignments"])


def test_decoder_post_step_matches_full_post():
    """Incremental output head (SA + projections) == full-sequence head."""
    hp = tiny_hparams(decoder="DualSourceSelfAttentionDecoder")
    mechs = (
        attention_factory("forward", hp.attention1_out_units, hp, module_name="attention_0"),
        attention_factory("additive", hp.attention2_out_units, hp, module_name="attention_1"),
    )
    dec = Decoder(
        attention_mechs=mechs,
        output_heads=(("mel", hp.num_mels),),
        outputs_per_step=hp.outputs_per_step,
        use_self_attention=True,
        self_attention_out_units=16,
        self_attention_num_heads=2,
        self_attention_num_hop=2,
        decoder_out_units=hp.decoder_out_units,
        attention_rnn_out_units=hp.attention_out_units,
        is_training=False,
    )
    B, N, D = 2, 6, hp.decoder_out_units
    features = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    variables = dec.init(jax.random.PRNGKey(1), features, method=Decoder.post)
    frames_full, stop_full, _ = dec.apply(variables, features, method=Decoder.post)

    caches = dec.apply(variables, B, N, method=Decoder.init_caches)
    r = hp.outputs_per_step
    for t in range(N):
        frames_t, stop_t, caches = dec.apply(
            variables, features[:, t], caches, jnp.int32(t), method=Decoder.post_step
        )
        np.testing.assert_allclose(
            np.asarray(frames_t["mel"]),
            np.asarray(frames_full["mel"][:, t * r : (t + 1) * r]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(stop_t), np.asarray(stop_full[:, t * r : (t + 1) * r]), atol=1e-5
        )


def test_teacher_feeds_construction():
    hp = tiny_hparams()
    mech = (attention_factory("forward", 8, hp, module_name="attention_0"),)
    dec = Decoder(
        attention_mechs=mech, output_heads=(("mel", 4),), outputs_per_step=2, n_feed_frame=2
    )
    targets = jnp.arange(2 * 8 * 4, dtype=jnp.float32).reshape(2, 8, 4)
    feeds = dec.make_teacher_feeds(targets)
    assert feeds.shape == (2, 4, 8)  # N=4 steps, n_feed(2) * dim(4)
    np.testing.assert_allclose(np.asarray(feeds[:, 0]), 0.0)  # go frame
    # step 1 fed the last 2 frames of group 0 = frames 0..1? no: frames r-n_feed..r-1 = 0,1
    np.testing.assert_allclose(
        np.asarray(feeds[0, 1]), np.asarray(targets[0, 0:2].reshape(-1))
    )
    np.testing.assert_allclose(
        np.asarray(feeds[0, 2]), np.asarray(targets[0, 2:4].reshape(-1))
    )


def test_model_factory_unknown_raises():
    hp = tiny_hparams(tacotron_model="NopeModel")
    with pytest.raises(ValueError):
        tacotron_model_factory(hp)


def test_dual_decoder_with_single_encoder_raises():
    hp = tiny_hparams(encoder="ZoneoutEncoderV1", decoder="DualSourceDecoder",
                      tacotron_model="DualSourceSelfAttentionTacotronModel")
    with pytest.raises(ValueError):
        tacotron_model_factory(hp)


def test_channel_id_to_postnet_conditions_postnet():
    """channel_id_to_postnet feeds the speaker embedding to PostNetV2 (wired r2)."""
    common = dict(
        tacotron_model="ExtendedTacotronV1Model",
        encoder="ZoneoutEncoderV1",
        decoder="ExtendedDecoder",
        use_postnet_v2=True,
        postnet_v2_num_layers=2,
        postnet_v2_out_channels=8,
        use_speaker_embedding=True,
    )
    hp = tiny_hparams(channel_id_to_postnet=True, **common)
    model = tacotron_model_factory(hp)
    batch = _batch(hp)
    net, variables, out, _ = _init_and_forward(model, batch)
    assert out.postnet_frames.shape == (2, 8, hp.num_mels)
    # the postnet's first conv consumes mel + speaker-embedding channels
    k = variables["params"]["postnet_v2"]["conv_0"]["Conv_0"]["kernel"]
    assert k.shape[-2] == hp.num_mels + hp.speaker_embedding_dim
    hp_off = tiny_hparams(channel_id_to_postnet=False, **common)
    model_off = tacotron_model_factory(hp_off)
    _, v_off, _, _ = _init_and_forward(model_off, _batch(hp_off))
    assert v_off["params"]["postnet_v2"]["conv_0"]["Conv_0"]["kernel"].shape[-2] == hp.num_mels


def test_convert_checkpoint_merge_helper(tmp_path):
    """merge_into_params overlays partial trees, skipping mismatches (ADVICE r1)."""
    import flax.serialization
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.convert_tf_checkpoint import merge_into_params

    params = {
        "embedding": {"embedding": np.zeros((4, 3), np.float32)},
        "decoder": {"prenet": {"kernel": np.zeros((2, 2), np.float32)}},
    }
    donor = {
        "embedding": {"embedding": np.ones((4, 3), np.float32)},
        "decoder": {"prenet": {"kernel": np.ones((5, 5), np.float32)}},  # wrong shape
        "mystery": {"w": np.ones((1,), np.float32)},                     # not in model
    }
    path = str(tmp_path / "donor.msgpack")
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(donor))
    merged, loaded, skipped = merge_into_params(params, path)
    np.testing.assert_array_equal(merged["embedding"]["embedding"], 1.0)
    np.testing.assert_array_equal(merged["decoder"]["prenet"]["kernel"], 0.0)
    assert loaded == ["embedding/embedding"]
    assert any("shape" in s for s in skipped) and any("not in model" in s for s in skipped)
