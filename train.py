#!/usr/bin/env python
"""Train a Tacotron model.

Reference-parity CLI (``self-attention-tacotron/train.py``, SURVEY.md §2.1
[M] — reconstructed; mount empty; flags mirror the reference docopt
surface on argparse since docopt is not in this image).

Usage:
  train.py --source-data-root=<dir> --target-data-root=<dir> \
           --checkpoint-dir=<dir> [--selected-list-dir=<dir>] \
           [--dataset=<name>] [--hparams=<k=v,...>] [--hparam-json-file=<path>] \
           [--steps=<n>] [--log-dir=<dir>]
"""

from __future__ import annotations

import argparse
import logging
import os


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source-data-root", required=True)
    p.add_argument("--target-data-root", default=None)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--selected-list-dir", default=None)
    p.add_argument("--selected-list-filename", default="train")
    p.add_argument("--validation-list-filename", default="validation")
    p.add_argument("--dataset", default=None, help="overrides hparams.dataset")
    p.add_argument("--hparams", default="", help="comma-separated k=v overrides")
    p.add_argument("--hparam-json-file", default=None)
    p.add_argument("--steps", type=int, default=100000)
    p.add_argument("--log-dir", default=None)
    p.add_argument(
        "--restore-from",
        default=None,
        help="warm-start params from another run's checkpoint dir (fine-tuning)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    from self_attention_tacotron_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    from self_attention_tacotron_tpu.data.dataset import (
        TacotronDataset,
        read_selected_list,
    )
    from self_attention_tacotron_tpu.hparams import default_hparams
    from self_attention_tacotron_tpu.models.models import tacotron_model_factory
    from self_attention_tacotron_tpu.training.trainer import Trainer

    hparams = default_hparams()
    if args.hparam_json_file:
        hparams.override_from_json_file(args.hparam_json_file)
    hparams.parse(args.hparams)
    if args.dataset:
        hparams.dataset = args.dataset

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(
                os.path.join(args.checkpoint_dir, hparams.logfile)
                if os.path.isdir(args.checkpoint_dir)
                else hparams.logfile
            ),
        ],
    )
    logging.info("hparams: %s", hparams.to_json())

    target_root = args.target_data_root or args.source_data_root
    train_ids = eval_ids = None
    if args.selected_list_dir:
        train_ids = read_selected_list(args.selected_list_dir, args.selected_list_filename)
        try:
            eval_ids = read_selected_list(args.selected_list_dir, args.validation_list_filename)
        except FileNotFoundError:
            eval_ids = None

    train_data = TacotronDataset(
        args.source_data_root, target_root, hparams, utterance_ids=train_ids
    )
    eval_data = (
        TacotronDataset(args.source_data_root, target_root, hparams, utterance_ids=eval_ids)
        if eval_ids
        else None
    )

    model = tacotron_model_factory(hparams)
    trainer = Trainer(model, args.checkpoint_dir, log_dir=args.log_dir)
    logging.info(
        "training %s on %s (%d train utterances)",
        hparams.tacotron_model,
        hparams.dataset,
        len(train_data),
    )
    trainer.train(
        train_data.batches(
            hparams.batch_size, shuffle=True, repeat=True, seed=hparams.random_seed
        ),
        num_steps=args.steps,
        eval_batches_fn=(
            (lambda: eval_data.batches(hparams.batch_size, shuffle=False, repeat=False))
            if eval_data
            else None
        ),
        warm_start_from=args.restore_from,
    )
    logging.info("training complete")


if __name__ == "__main__":
    main()
