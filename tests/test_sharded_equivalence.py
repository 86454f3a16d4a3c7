"""SPMD correctness: sharded training step == single-device step.

SURVEY.md §4 implication (4): "pjit sharded == unsharded". Runs one full
train step on the flagship model twice — replicated on one device vs
data-parallel + tensor-parallel over the 8-device virtual CPU mesh — and
checks the updated parameters match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from self_attention_tacotron_tpu.models.models import tacotron_model_factory
from self_attention_tacotron_tpu.parallel import make_mesh, shard_batch, shard_params
from self_attention_tacotron_tpu.training.schedules import make_optimizer
from self_attention_tacotron_tpu.training.trainer import TrainState, targets_from_batch
from tests.test_models import tiny_hparams


@pytest.mark.slow
def test_dp_tp_train_step_matches_single_device():
    hp = tiny_hparams(
        tacotron_model="DualSourceSelfAttentionTacotronModel",
        encoder="SelfAttentionCBHGEncoder",
        decoder="DualSourceSelfAttentionDecoder",
        # dims divisible by the model axis so TP rules engage
        self_attention_transformer_ffn_units=32,
        decoder_prenet_drop_rate=0.0,
        encoder_prenet_drop_rate=0.0,
        self_attention_drop_rate=0.0,
        decoder_self_attention_drop_rate=0.0,
        zoneout_factor_cell=0.0,
        zoneout_factor_output=0.0,
    )
    model = tacotron_model_factory(hp)
    net = model.network(is_training=True)
    B, S, T = 8, 16, 8
    rng = np.random.RandomState(0)
    batch = {
        "source": jnp.asarray(rng.randint(2, hp.num_symbols, (B, S)), jnp.int32),
        "source_lengths": jnp.full((B,), S, jnp.int32),
        "mel": jnp.asarray(rng.rand(B, T, hp.num_mels), jnp.float32),
        "target_lengths": jnp.full((B,), T, jnp.int32),
        "done": jnp.zeros((B, T), jnp.float32),
    }
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(["params", "dropout", "zoneout"])}
    variables = net.init(
        rngs, batch["source"], batch["source_lengths"], batch["mel"],
        batch["target_lengths"],
    )
    tx = make_optimizer(hp)

    def train_step(state, b, rng_step):
        def loss_fn(p):
            out, mut = net.apply(
                {"params": p, **({"batch_stats": state.batch_stats} if state.batch_stats else {})},
                b["source"], b["source_lengths"],
                targets_from_batch(model, b), b["target_lengths"],
                rngs={"dropout": rng_step, "zoneout": jax.random.fold_in(rng_step, 1)},
                mutable=["batch_stats"],
            )
            return model.loss(out, b)["loss"], mut.get("batch_stats", {})

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt_state, state.params)
        return optax.apply_updates(state.params, updates), loss

    def make_state(params):
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            batch_stats=variables.get("batch_stats", {}),
        )

    key = jax.random.PRNGKey(3)

    # single device (first CPU device)
    single_params, single_loss = jax.jit(train_step)(
        make_state(variables["params"]), batch, key
    )

    # 4x2 dp x tp mesh
    mesh = make_mesh((4, 2))
    sharded = shard_params(variables["params"], mesh)
    device_batch = shard_batch(dict(batch), mesh)
    with mesh:
        mesh_params, mesh_loss = jax.jit(train_step)(
            make_state(sharded), device_batch, key
        )

    assert np.allclose(float(single_loss), float(mesh_loss), rtol=1e-5)
    flat_a = jax.tree.leaves(single_params)
    flat_b = jax.tree.leaves(mesh_params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)
