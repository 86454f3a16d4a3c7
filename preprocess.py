#!/usr/bin/env python
"""Preprocess a corpus into per-utterance source/target TFRecord pairs.

Reference-parity CLI (``self-attention-tacotron/preprocess*.py``,
SURVEY.md §2.1/§3.1 [M] — reconstructed; mount empty). The reference
parallelized with PySpark; this uses a multiprocessing pool.

Usage:
  preprocess.py <dataset> <in_dir> <out_dir> [--hparams=<k=v,...>] \
                [--num-workers=<n>] [--write-selected-lists=<dir>]
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", help="ljspeech | vctk | japanese | synthetic")
    p.add_argument("in_dir")
    p.add_argument("out_dir")
    p.add_argument("--hparams", default="")
    p.add_argument("--hparam-json-file", default=None)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument(
        "--write-selected-lists",
        default=None,
        help="also write train/validation/test id lists to this directory",
    )
    args = p.parse_args()

    from self_attention_tacotron_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    from self_attention_tacotron_tpu.data.corpus import write_selected_lists
    from self_attention_tacotron_tpu.data.dataset_factory import dataset_factory
    from self_attention_tacotron_tpu.hparams import default_hparams

    hparams = default_hparams()
    if args.hparam_json_file:
        hparams.override_from_json_file(args.hparam_json_file)
    hparams.parse(args.hparams)
    cls = dataset_factory(args.dataset)
    pre = cls(args.in_dir, args.out_dir, hparams)
    warnings = pre.preprocess(num_workers=args.num_workers)
    for w in warnings:
        print(f"WARNING: {w}")
    if args.write_selected_lists:
        src_ext = "." + hparams.source_file_extension
        import os

        ids = [
            f[: -len(src_ext)]
            for f in os.listdir(args.out_dir)
            if f.endswith(src_ext)
        ]
        write_selected_lists(args.write_selected_lists, ids)
    print(f"done: {args.dataset} → {args.out_dir}")


if __name__ == "__main__":
    main()
