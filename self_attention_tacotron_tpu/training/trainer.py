"""Trainer: jitted data-parallel train/eval steps, orbax checkpoints, metrics.

Capability parity with the reference Estimator train/evaluate loop
(SURVEY.md §3.2 [M] — reconstructed; mount empty): periodic evaluation,
scalar summaries, alignment/mel PNG artifacts at eval, checkpointing with
``save_checkpoints_steps`` / ``keep_checkpoint_max`` and automatic resume
from the latest checkpoint.

TPU-first: a single jitted train step (forward + backward + optax update,
donated state) compiled per bucket shape; batches are sharded over the
mesh 'data' axis and parameters placed by the tensor-parallel rules in
parallel/mesh.py — XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp

from self_attention_tacotron_tpu.models.models import TacotronModelBase
from self_attention_tacotron_tpu.parallel import make_mesh, shard_batch, shard_params
from self_attention_tacotron_tpu.training.metrics import (
    MetricsWriter,
    save_alignment_png,
    save_mel_comparison_png,
)
from self_attention_tacotron_tpu.training.schedules import make_optimizer


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any


def targets_from_batch(model: TacotronModelBase, batch: Dict[str, jnp.ndarray]):
    """Concatenate per-head targets in decoder head order (feed-back order)."""
    hp = model.hparams
    parts = []
    for head in model.HEADS:
        if head == "lf0":
            parts.append(jax.nn.one_hot(batch["lf0"], hp.num_lf0s))
        else:
            parts.append(batch[head])
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _variables_from_npz(npz_path: str) -> Dict[str, Any]:
    """Flat ``collection/mod/.../leaf`` npz → nested flax variables dict.

    Inverse of ``scripts/convergence_run.export_params_npz`` — the compact
    trained-params artifact committed per evidence round.
    """
    import flax.traverse_util as tu

    flat = dict(np.load(npz_path))
    nested: Dict[str, Dict[tuple, np.ndarray]] = {}
    for key, value in flat.items():
        collection, rest = key.split("/", 1)
        nested.setdefault(collection, {})[tuple(rest.split("/"))] = value
    return {c: tu.unflatten_dict(leaves) for c, leaves in nested.items()}


def _network_kwargs(model, batch):
    kwargs = {}
    if model.hparams.use_accent_type:
        kwargs["accent_type"] = batch["accent_type"]
    if model.hparams.use_speaker_embedding:
        kwargs["speaker_id"] = batch["speaker_id"]
    return kwargs


class Trainer:
    def __init__(
        self,
        model: TacotronModelBase,
        checkpoint_dir: str,
        log_dir: Optional[str] = None,
        mesh=None,
    ):
        self.model = model
        self.hparams = model.hparams
        self.net = model.network(is_training=True)
        self.eval_net = model.network(is_training=False)
        self.tx = make_optimizer(self.hparams)
        self.mesh = mesh if mesh is not None else make_mesh(self.hparams.mesh_shape)
        self.checkpoint_dir = os.path.abspath(checkpoint_dir)
        self.log_dir = os.path.abspath(log_dir or os.path.join(checkpoint_dir, "log"))
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)
        self.metrics = MetricsWriter(self.log_dir)
        self.ckpt_manager = ocp.CheckpointManager(
            self.checkpoint_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=self.hparams.keep_checkpoint_max,
                # reference keep_checkpoint_every_n_hours: checkpoints on
                # this time grid survive the max_to_keep eviction
                keep_time_interval=(
                    datetime.timedelta(hours=self.hparams.keep_checkpoint_every_n_hours)
                    if self.hparams.keep_checkpoint_every_n_hours > 0
                    else None
                ),
                create=True,
            ),
        )
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=0)
        self._eval_step = jax.jit(self._eval_step_impl)

    # ----------------------------- state ----------------------------- #

    def init_state(self, rng: jax.Array, sample_batch: Dict[str, np.ndarray]) -> TrainState:
        batch = shard_batch({k: jnp.asarray(v) for k, v in sample_batch.items()
                             if not isinstance(v, np.ndarray) or v.dtype.kind not in "US"},
                            self.mesh)
        targets = targets_from_batch(self.model, batch)
        rngs = {
            "params": rng,
            "dropout": jax.random.fold_in(rng, 1),
            "zoneout": jax.random.fold_in(rng, 2),
        }
        variables = self.net.init(
            rngs,
            batch["source"],
            batch["source_lengths"],
            targets,
            batch["target_lengths"],
            **_network_kwargs(self.model, batch),
        )
        params = shard_params(variables["params"], self.mesh)
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            batch_stats=batch_stats,
        )

    def restore_or_init(
        self,
        rng: jax.Array,
        sample_batch: Dict[str, np.ndarray],
        warm_start_from: Optional[str] = None,
    ) -> TrainState:
        """Auto-resume from the latest checkpoint (Estimator parity).

        ``warm_start_from``: when no checkpoint exists in this run's
        directory, initialize params/batch_stats from the latest
        checkpoint of another run (fine-tuning; optimizer state and step
        start fresh — reference warm-start semantics, SURVEY.md §5 [L]).
        Accepts either an orbax checkpoint directory or a flat ``.npz``
        exported by ``scripts/convergence_run.export_params_npz``.
        """
        state = self.init_state(rng, sample_batch)
        latest = self.ckpt_manager.latest_step()
        if latest is not None:
            return self.ckpt_manager.restore(
                latest, args=ocp.args.StandardRestore(state)
            )
        if warm_start_from and warm_start_from.endswith(".npz"):
            donor_vars = _variables_from_npz(warm_start_from)
            # tree_map raises on structure mismatch — architecture must be
            # identical to the donor run; dtype follows the init leaf.
            params = jax.tree_util.tree_map(
                lambda init, d: jnp.asarray(d, init.dtype),
                state.params,
                donor_vars["params"],
            )
            batch_stats = state.batch_stats
            if batch_stats and donor_vars.get("batch_stats"):
                batch_stats = jax.tree_util.tree_map(
                    lambda init, d: jnp.asarray(d, init.dtype),
                    batch_stats,
                    donor_vars["batch_stats"],
                )
            state = TrainState(
                step=state.step,
                params=shard_params(params, self.mesh),
                opt_state=state.opt_state,
                batch_stats=batch_stats,
            )
        elif warm_start_from:
            src = ocp.CheckpointManager(os.path.abspath(warm_start_from))
            src_step = src.latest_step()
            if src_step is None:
                raise FileNotFoundError(
                    f"warm-start dir {warm_start_from!r} has no checkpoints"
                )
            donor = src.restore(src_step, args=ocp.args.StandardRestore(state))
            state = TrainState(
                step=state.step,
                params=donor.params,
                opt_state=state.opt_state,
                batch_stats=donor.batch_stats,
            )
        return state

    def restore_inference(
        self, rng: jax.Array, sample_batch: Dict[str, np.ndarray]
    ) -> TrainState:
        """Params/batch_stats-only restore for PREDICT mode.

        ``restore_or_init`` restores the FULL train state against a target
        tree, which makes synthesis fail whenever optimizer hparams differ
        from the training run (e.g. ``use_gradient_clipping`` changes the
        opt_state pytree structure). Inference only needs params and
        batch_stats, so restore without a target and overlay just those
        collections onto a fresh init; opt_state stays at init and is
        never consulted. Raises when the directory has no checkpoint —
        synthesizing from random weights is never what a predict CLI user
        wants.
        """
        state = self.init_state(rng, sample_batch)
        latest = self.ckpt_manager.latest_step()
        if latest is None:
            raise FileNotFoundError(
                f"no checkpoint found under {self.checkpoint_dir!r}"
            )
        raw = self.ckpt_manager.restore(latest)

        def _collection(name):
            return raw[name] if isinstance(raw, dict) else getattr(raw, name)

        params = jax.tree_util.tree_map(
            lambda init, d: jnp.asarray(d, init.dtype),
            state.params,
            _collection("params"),
        )
        batch_stats = state.batch_stats
        if batch_stats:
            batch_stats = jax.tree_util.tree_map(
                lambda init, d: jnp.asarray(d, init.dtype),
                batch_stats,
                _collection("batch_stats"),
            )
        return TrainState(
            step=jnp.asarray(latest, jnp.int32),
            params=shard_params(params, self.mesh),
            opt_state=state.opt_state,
            batch_stats=batch_stats,
        )

    def save(self, state: TrainState) -> None:
        self.ckpt_manager.save(int(state.step), args=ocp.args.StandardSave(state))
        self.ckpt_manager.wait_until_finished()

    # --------------------------- train step --------------------------- #

    def _forward(self, net, params, batch_stats, batch, rng, mutable):
        targets = targets_from_batch(self.model, batch)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        rngs = {
            "dropout": jax.random.fold_in(rng, 17),
            "zoneout": jax.random.fold_in(rng, 23),
        }
        kwargs = _network_kwargs(self.model, batch)
        if mutable:
            out, mut = net.apply(
                variables,
                batch["source"],
                batch["source_lengths"],
                targets,
                batch["target_lengths"],
                rngs=rngs,
                mutable=["batch_stats"],
                **kwargs,
            )
            return out, mut.get("batch_stats", {})
        out = net.apply(
            variables,
            batch["source"],
            batch["source_lengths"],
            targets,
            batch["target_lengths"],
            rngs=rngs,
            **kwargs,
        )
        return out, batch_stats

    def _train_step_impl(self, state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out, new_stats = self._forward(
                self.net, params, state.batch_stats, batch, step_rng, mutable=True
            )
            losses = self.model.loss(out, batch, params=params)
            return losses["loss"], (losses, new_stats)

        grads, (losses, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_stats,
        )
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    def _eval_step_impl(self, state: TrainState, batch, rng):
        out, _ = self._forward(
            self.eval_net, state.params, state.batch_stats, batch, rng, mutable=False
        )
        losses = self.model.loss(out, batch)
        return losses, out

    # ----------------------------- loops ------------------------------ #

    def train(
        self,
        train_batches: Iterator[Dict[str, np.ndarray]],
        num_steps: int,
        *,
        rng: Optional[jax.Array] = None,
        eval_batches_fn=None,
        state: Optional[TrainState] = None,
        warm_start_from: Optional[str] = None,
    ) -> TrainState:
        hp = self.hparams
        rng = rng if rng is not None else jax.random.PRNGKey(hp.random_seed)
        # normalize to an iterator up front: a re-iterable (e.g. a list)
        # would otherwise replay the peeked first batch twice per pass
        train_batches = iter(train_batches)
        first = next(train_batches)
        if state is None:
            state = self.restore_or_init(rng, first, warm_start_from=warm_start_from)
        start = int(state.step)

        train_start = time.monotonic()
        last_eval_time: Optional[float] = None
        window_t0 = time.monotonic()
        window_steps = 0
        batch_iter = _chain_first(first, train_batches)
        for batch in batch_iter:
            if int(state.step) - start >= num_steps:
                break
            device_batch = shard_batch(
                {k: v for k, v in batch.items() if k != "id"}, self.mesh
            )
            state, metrics = self._train_step(state, device_batch, rng)
            step = int(state.step)
            window_steps += 1
            # log_step_count_steps: step-loss logging cadence;
            # save_summary_steps: scalar-summary cadence (both feed the
            # same JSONL+TensorBoard writer here — union of the two grids)
            if (
                step % hp.log_step_count_steps == 0
                or step % hp.save_summary_steps == 0
                or step == start + 1
            ):
                scalars = {k: float(v) for k, v in metrics.items()}
                if hp.save_training_time_metrics:
                    dt = max(time.monotonic() - window_t0, 1e-9)
                    scalars["steps_per_sec"] = window_steps / dt
                    scalars["frames_per_sec"] = (
                        window_steps
                        * float(np.sum(np.asarray(batch["target_lengths"])))
                        / dt
                    )
                self.metrics.write(step, scalars)
                window_t0 = time.monotonic()
                window_steps = 0
            if step % hp.save_checkpoints_steps == 0:
                self.save(state)
            # MetricsSaverHook parity: alignment/mel PNGs on a TRAINING
            # step cadence (rendered from an eval-mode forward on the
            # current batch), independent of the eval loop
            if step % hp.alignment_save_steps == 0:
                _, out = self._eval_step(
                    state, device_batch, jax.random.fold_in(rng, step)
                )
                self._save_artifacts(step, out, batch, tag="train_")
            # train_and_evaluate parity: eval follows new checkpoints,
            # gated by eval_start_delay_secs / eval_throttle_secs
            if eval_batches_fn is not None and step % hp.save_checkpoints_steps == 0:
                now = time.monotonic()
                if now - train_start >= hp.eval_start_delay_secs and (
                    last_eval_time is None
                    or now - last_eval_time >= hp.eval_throttle_secs
                ):
                    self.evaluate(state, eval_batches_fn(), rng)
                    last_eval_time = time.monotonic()
        self.save(state)
        return state

    #: utterances rendered to PNGs per eval (alignment debugging wants >1)
    EVAL_PLOT_UTTERANCES = 3

    def evaluate(self, state: TrainState, eval_batches, rng) -> Dict[str, float]:
        hp = self.hparams
        # decouple the eval dropout/zoneout stream from training's
        rng = jax.random.fold_in(rng, 7919)
        totals: Dict[str, float] = {}
        count = 0
        first_out = first_batch = None
        for i, batch in enumerate(eval_batches):
            if i >= hp.num_evaluation_steps:
                break
            device_batch = shard_batch(
                {k: v for k, v in batch.items() if k != "id"}, self.mesh
            )
            losses, out = self._eval_step(state, device_batch, jax.random.fold_in(rng, i))
            if first_out is None:
                first_out, first_batch = out, batch
            for k, v in losses.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            count += 1
        if count == 0:
            return {}
        means = {f"eval_{k}": v / count for k, v in totals.items()}
        step = int(state.step)
        self.metrics.write(step, means)
        self._save_artifacts(
            step, first_out, first_batch, max_utts=self.EVAL_PLOT_UTTERANCES
        )
        return means

    def _save_artifacts(self, step: int, out, batch, *, tag="", max_utts=1) -> None:
        """Alignment + mel comparison PNGs (MetricsSaverHook parity)."""
        r = self.hparams.outputs_per_step
        n = min(max_utts, int(batch["source_lengths"].shape[0]))
        for u in range(n):
            suffix = f"_utt{u}" if n > 1 else ""
            dec_steps = int(batch["target_lengths"][u]) // r
            src_len = int(batch["source_lengths"][u])
            aligns = [np.asarray(a[u]) for a in out.alignments]
            save_alignment_png(
                aligns,
                os.path.join(
                    self.log_dir, f"{tag}alignment_step{step:08d}{suffix}.png"
                ),
                info=f"step {step}",
                source_length=src_len,
                decoder_steps=dec_steps,
            )
            if "mel" in out.frames:
                save_mel_comparison_png(
                    np.asarray(out.frames["mel"][u]),
                    np.asarray(batch["mel"][u]),
                    os.path.join(self.log_dir, f"{tag}mel_step{step:08d}{suffix}.png"),
                    info=f"step {step}",
                    length=int(batch["target_lengths"][u]),
                )


def _chain_first(first, iterator):
    yield first
    yield from iterator
