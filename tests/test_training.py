"""End-to-end smoke: synthetic corpus → short training → loss decreases,
checkpoint auto-resume works, eval artifacts are written (SURVEY.md §4 (3))."""

import glob
import os

import jax
import numpy as np
import pytest

from self_attention_tacotron_tpu.data.dataset import TacotronDataset
from self_attention_tacotron_tpu.data.synthetic import generate_corpus
from self_attention_tacotron_tpu.models.models import tacotron_model_factory
from self_attention_tacotron_tpu.training.schedules import learning_rate_schedule
from self_attention_tacotron_tpu.training.trainer import Trainer
from tests.test_models import tiny_hparams


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_corpus")
    hp = tiny_hparams(
        tacotron_model="DualSourceSelfAttentionTacotronModel",
        encoder="SelfAttentionCBHGEncoder",
        decoder="DualSourceDecoder",
        sample_rate=8000,
        num_freq=129,
        frame_length_ms=32,
        frame_shift_ms=16,
        batch_size=4,
        batch_bucket_width=16,
        save_checkpoints_steps=10,
        log_step_count_steps=5,
        alignment_save_steps=1000,
        num_evaluation_steps=2,
        initial_learning_rate=1e-3,
    )
    generate_corpus(str(root), hp, num_utterances=8, min_symbols=4, max_symbols=8)
    data = TacotronDataset(str(root), str(root), hp)
    return root, hp, data


def test_lr_schedule_decays():
    hp = tiny_hparams(initial_learning_rate=1e-3, decay_learning_rate=True)
    sched = learning_rate_schedule(hp)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(50_000)) == pytest.approx(5e-4, rel=1e-3)
    assert float(sched(10_000_000)) == pytest.approx(1e-5, rel=1e-3)  # floor


def test_train_loss_decreases_and_resume(tiny_setup, tmp_path):
    root, hp, data = tiny_setup
    ckpt = str(tmp_path / "ckpt")
    model = tacotron_model_factory(hp)
    trainer = Trainer(model, ckpt)

    batches = data.batches(4, shuffle=True, repeat=True, seed=0, prefetch=0)
    state = trainer.train(batches, num_steps=12)
    assert int(state.step) == 12

    # metrics were logged and a checkpoint exists
    metrics_file = os.path.join(trainer.log_dir, "metrics.jsonl")
    assert os.path.exists(metrics_file)
    lines = open(metrics_file).read().strip().splitlines()
    assert len(lines) >= 2
    import json

    first = json.loads(lines[0])
    last = json.loads(lines[-1])
    assert last["loss"] < first["loss"] * 1.5  # not diverging
    assert np.isfinite(last["loss"])

    # auto-resume picks up the saved step
    trainer2 = Trainer(model, ckpt)
    batches2 = data.batches(4, shuffle=True, repeat=True, seed=1, prefetch=0)
    restored = trainer2.restore_or_init(jax.random.PRNGKey(0), next(iter(batches2)))
    assert int(restored.step) == 12
    # params restored identically
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))


def test_restore_inference_tolerates_optimizer_mismatch(tiny_setup, tmp_path):
    """PREDICT-mode restore must not depend on the opt_state pytree:
    flipping use_gradient_clipping between train and predict changes the
    optimizer chain structure, which used to crash predict_mel.py's full
    StandardRestore. restore_inference overlays params/batch_stats only."""
    import copy

    root, hp, data = tiny_setup
    ckpt = str(tmp_path / "ckpt_inf")
    model = tacotron_model_factory(hp)
    trainer = Trainer(model, ckpt)
    batches = data.batches(4, shuffle=True, repeat=True, seed=0, prefetch=0)
    state = trainer.train(batches, num_steps=2)

    hp2 = copy.deepcopy(hp)
    hp2.use_gradient_clipping = not hp.use_gradient_clipping
    model2 = tacotron_model_factory(hp2)
    trainer2 = Trainer(model2, ckpt)
    restored = trainer2.restore_inference(
        jax.random.PRNGKey(0), next(iter(data.batches(4, prefetch=0)))
    )
    assert int(restored.step) == 2
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))

    # empty checkpoint dir: synthesis from random weights must refuse
    trainer3 = Trainer(model, str(tmp_path / "ckpt_empty"))
    with pytest.raises(FileNotFoundError):
        trainer3.restore_inference(
            jax.random.PRNGKey(0), next(iter(data.batches(4, prefetch=0)))
        )


def test_evaluate_writes_artifacts(tiny_setup, tmp_path):
    root, hp, data = tiny_setup
    model = tacotron_model_factory(hp)
    trainer = Trainer(model, str(tmp_path / "ckpt2"))
    batches = data.batches(4, shuffle=False, repeat=False, prefetch=0)
    state = trainer.restore_or_init(jax.random.PRNGKey(0), next(iter(batches)))
    means = trainer.evaluate(
        state, data.batches(4, shuffle=False, repeat=False, prefetch=0), jax.random.PRNGKey(1)
    )
    assert "eval_loss" in means and np.isfinite(means["eval_loss"])
    assert glob.glob(os.path.join(trainer.log_dir, "alignment_step*.png"))
    assert glob.glob(os.path.join(trainer.log_dir, "mel_step*.png"))


def test_train_cadence_artifacts_and_time_metrics(tiny_setup, tmp_path):
    """alignment_save_steps renders PNGs DURING training (VERDICT r1 item 9),
    save_training_time_metrics adds steps/sec, eval obeys throttle gates."""
    import copy
    import json

    root, hp, data = tiny_setup
    hp = copy.deepcopy(hp)
    hp.alignment_save_steps = 3
    hp.save_training_time_metrics = True
    hp.save_checkpoints_steps = 2
    hp.eval_start_delay_secs = 10_000    # gate: no eval in this short run
    model = tacotron_model_factory(hp)
    trainer = Trainer(model, str(tmp_path / "ckpt3"))
    evals = []

    def eval_fn():
        evals.append(1)
        return data.batches(4, shuffle=False, repeat=False, prefetch=0)

    trainer.train(
        data.batches(4, shuffle=True, repeat=True, seed=0, prefetch=0),
        num_steps=4,
        eval_batches_fn=eval_fn,
    )
    # training-cadence artifact at step 3
    assert glob.glob(os.path.join(trainer.log_dir, "train_alignment_step*.png"))
    assert glob.glob(os.path.join(trainer.log_dir, "train_mel_step*.png"))
    # eval_start_delay_secs gated the eval off
    assert not evals
    # step-time metrics recorded
    lines = [json.loads(l) for l in open(os.path.join(trainer.log_dir, "metrics.jsonl"))]
    assert any("steps_per_sec" in l and l["steps_per_sec"] > 0 for l in lines)
    assert any("frames_per_sec" in l for l in lines)

    # with the delay gate open, eval runs on the checkpoint cadence
    hp.eval_start_delay_secs = 0
    hp.eval_throttle_secs = 0
    hp.alignment_save_steps = 1000
    model2 = tacotron_model_factory(hp)
    trainer2 = Trainer(model2, str(tmp_path / "ckpt4"))
    trainer2.train(
        data.batches(4, shuffle=True, repeat=True, seed=0, prefetch=0),
        num_steps=2,
        eval_batches_fn=eval_fn,
    )
    assert evals
    # eval writes multiple utterances' plots
    aligns = glob.glob(os.path.join(trainer2.log_dir, "alignment_step*_utt*.png"))
    assert len(aligns) >= 2


def test_trainer_list_input_not_double_trained(tiny_setup, tmp_path):
    """ADVICE r1: a re-iterable (list) input must not replay the first batch."""
    root, hp, data = tiny_setup
    model = tacotron_model_factory(hp)
    trainer = Trainer(model, str(tmp_path / "ckpt5"))
    batches = list(data.batches(4, shuffle=False, repeat=False, prefetch=0))
    seen = []
    orig = trainer._train_step

    def spy(state, batch, rng):
        seen.append(np.asarray(batch["source"]).sum())
        return orig(state, batch, rng)

    trainer._train_step = spy
    trainer.train(batches, num_steps=2)
    assert len(seen) == 2
    assert seen[0] != seen[1] or len(set(seen)) > 1  # not the same batch twice


def test_mel_png_bf16_renders_identical_to_f32(tmp_path):
    """matplotlib silently renders ml_dtypes.bfloat16 arrays as a BLANK
    panel at mel-comparison shapes (reproduced 2026-08-17, and it blanked
    every train/eval mel artifact under bf16 compute); the renderers must
    cast, making the bf16 and f32 renders pixel-identical."""
    import jax.numpy as jnp
    import matplotlib.image as mpimg

    from self_attention_tacotron_tpu.training.metrics import (
        save_alignment_png,
        save_mel_comparison_png,
    )

    t = np.arange(122)[:, None]
    b = np.arange(80)[None, :]
    mel = (np.exp(-((b - (8 + 6 * np.sin(t / 9))) ** 2) / 6.0) * 0.7).astype(
        np.float32
    )
    mel16 = jnp.asarray(mel, jnp.bfloat16)
    mel_q = np.asarray(mel16).astype(np.float32)  # same values, f32 container
    p16, p32 = str(tmp_path / "bf16.png"), str(tmp_path / "f32.png")
    save_mel_comparison_png(mel16, mel, p16, length=100)
    save_mel_comparison_png(mel_q, mel, p32, length=100)
    np.testing.assert_array_equal(mpimg.imread(p16), mpimg.imread(p32))

    align = (mel[:, :40] / mel.max()).astype(np.float32)
    align16 = jnp.asarray(align, jnp.bfloat16)
    a16, a32 = str(tmp_path / "a16.png"), str(tmp_path / "a32.png")
    save_alignment_png([align16], a16)
    save_alignment_png([np.asarray(align16).astype(np.float32)], a32)
    np.testing.assert_array_equal(mpimg.imread(a16), mpimg.imread(a32))


def test_warm_start_from_npz(tiny_setup, tmp_path):
    """restore_or_init accepts a flat .npz (export_params_npz format) —
    the cross-round fine-tune path: orbax run dirs don't survive between
    rounds, only the committed compact npz does."""
    import flax.traverse_util as tu
    import numpy as np

    root, hp, data = tiny_setup
    model = tacotron_model_factory(hp)
    trainer = Trainer(model, str(tmp_path / "ckpt_npz_src"))
    batches = data.batches(4, shuffle=True, repeat=True, seed=0, prefetch=0)
    state = trainer.train(batches, num_steps=3)

    # export in the scripts/convergence_run.export_params_npz layout
    arrays = {}
    for collection, tree in (("params", state.params),
                             ("batch_stats", state.batch_stats)):
        flat = tu.flatten_dict(tree, sep="/")
        arrays.update({f"{collection}/{k}": np.asarray(v, np.float32)
                       for k, v in flat.items()})
    npz = str(tmp_path / "donor.npz")
    np.savez_compressed(npz, **arrays)

    trainer2 = Trainer(model, str(tmp_path / "ckpt_npz_dst"))
    sample = next(iter(data.batches(4, shuffle=False, repeat=False, seed=1,
                                    prefetch=0)))
    restored = trainer2.restore_or_init(
        jax.random.PRNGKey(7), sample, warm_start_from=npz
    )
    # fine-tune semantics: params come from the donor, step restarts at 0
    assert int(restored.step) == 0
    donor_flat = tu.flatten_dict(state.params, sep="/")
    restored_flat = tu.flatten_dict(restored.params, sep="/")
    assert donor_flat.keys() == restored_flat.keys()
    for k in donor_flat:
        np.testing.assert_allclose(
            np.asarray(restored_flat[k], np.float32),
            np.asarray(donor_flat[k], np.float32),
            rtol=1e-6, atol=1e-6, err_msg=k)
    # and training proceeds from the donor weights
    state2 = trainer2.train(
        data.batches(4, shuffle=True, repeat=True, seed=2, prefetch=0),
        num_steps=2,
    )
    assert int(state2.step) == 2
