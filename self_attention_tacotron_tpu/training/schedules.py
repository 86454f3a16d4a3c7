"""Learning-rate schedules (reference: Adam + LR decay, SURVEY.md §2.1 [M]).

The reference decays the learning rate when ``decay_learning_rate`` is on
(exact schedule unverifiable — mount empty). Implemented here as the
Tacotron-lineage exponential half-life schedule, floored at 1% of the
initial rate; honors ``initial_learning_rate`` and
``learning_rate_step_factor``.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def learning_rate_schedule(hparams) -> optax.Schedule:
    init = hparams.initial_learning_rate
    factor = max(hparams.learning_rate_step_factor, 1)
    if not hparams.decay_learning_rate:
        return optax.constant_schedule(init)

    def fn(step):
        eff = jnp.asarray(step, jnp.float32) * factor
        lr = init * jnp.power(0.5, eff / 50_000.0)
        return jnp.maximum(lr, init / 100.0)

    return fn


def make_optimizer(hparams) -> optax.GradientTransformation:
    schedule = learning_rate_schedule(hparams)
    tx = optax.adam(
        schedule,
        b1=hparams.adam_beta1,
        b2=hparams.adam_beta2,
        eps=hparams.adam_eps,
    )
    if hparams.use_gradient_clipping and hparams.gradient_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(hparams.gradient_clip_norm), tx)
    return tx
