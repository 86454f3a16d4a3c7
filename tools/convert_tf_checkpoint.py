#!/usr/bin/env python
"""Convert a reference TensorFlow checkpoint into this framework's params.

Purpose (SURVEY.md §5 "Checkpoint / resume"): the north-star quality
target is mel MSE ≤ 1e-3 vs a TF reference checkpoint, which requires
importing reference weights. The reference repo was unavailable in every
build session (mount empty), so the TF-side variable names below are the
RECONSTRUCTED best guesses, kept in ONE table (``NAME_MAP``) so they can
be corrected in minutes once a real checkpoint is available — run with
``--list-only`` against the checkpoint to see its actual variable names.

Usage:
  tools/convert_tf_checkpoint.py <tf_ckpt_prefix> <out.msgpack> \
      [--hparams=...] [--list-only]

The output is a flax msgpack of the PARTIAL tree NAME_MAP resolves (the
encoder/self-attention rows are not mapped yet — blocked on the mount).
``flax.serialization.from_bytes`` requires an exactly matching tree, so do
NOT load it that way; merge it into an initialized params tree instead:

    from tools.convert_tf_checkpoint import merge_into_params
    params, loaded, skipped = merge_into_params(variables["params"], path)
"""

from __future__ import annotations

import argparse
import re
import sys
from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------- #
# JAX param path (this framework) → candidate TF variable names (reference)
# [VERIFY ON MOUNT]: reconstructed; placeholders use {i} for layer indices.
# TF LSTM kernels are (in+hid, 4*units) with gate order i,j(f?),f,o — the
# loader transposes/reorders per the ``transform`` tag.
# ---------------------------------------------------------------------- #
NAME_MAP: List[Tuple[str, List[str], str]] = [
    ("embedding/embedding",
     ["embedding/embedding", "Embedding/embeddings"], "none"),
    ("decoder/prenet/Dense_0/kernel",
     ["decoder/prenets/dense/kernel", "decoder/prenet/dense/kernel"], "none"),
    ("decoder/prenet/Dense_0/bias",
     ["decoder/prenets/dense/bias", "decoder/prenet/dense/bias"], "none"),
    ("decoder/prenet/Dense_1/kernel",
     ["decoder/prenets/dense_1/kernel"], "none"),
    ("decoder/prenet/Dense_1/bias",
     ["decoder/prenets/dense_1/bias"], "none"),
    ("decoder/attention_lstm/gates/kernel",
     ["decoder/attention_rnn/lstm_cell/kernel"], "lstm_gate_order"),
    ("decoder/attention_lstm/gates/bias",
     ["decoder/attention_rnn/lstm_cell/bias"], "lstm_gate_order"),
    ("decoder/decoder_lstm_0/gates/kernel",
     ["decoder/decoder_rnn/multi_rnn_cell/cell_0/lstm_cell/kernel"], "lstm_gate_order"),
    ("decoder/decoder_lstm_0/gates/bias",
     ["decoder/decoder_rnn/multi_rnn_cell/cell_0/lstm_cell/bias"], "lstm_gate_order"),
    ("decoder/decoder_lstm_1/gates/kernel",
     ["decoder/decoder_rnn/multi_rnn_cell/cell_1/lstm_cell/kernel"], "lstm_gate_order"),
    ("decoder/decoder_lstm_1/gates/bias",
     ["decoder/decoder_rnn/multi_rnn_cell/cell_1/lstm_cell/bias"], "lstm_gate_order"),
    ("attention_0/memory_layer/kernel",
     ["memory_layer/kernel", "attention/memory_layer/kernel"], "none"),
    ("attention_0/attention_v",
     ["attention_v", "ForwardAttention/attention_v"], "expand_last"),
    ("attention_1/memory_layer/kernel",
     ["memory_layer_1/kernel"], "none"),
    ("attention_1/attention_v",
     ["attention_v_1"], "expand_last"),
    ("decoder/output_projection/kernel",
     ["decoder/frame_projection/kernel"], "none"),
    ("decoder/output_projection/bias",
     ["decoder/frame_projection/bias"], "none"),
]

# TF LSTMCell gate order is (i, j, f, o) with j = candidate; ours is
# (i, g, f, o) with g = candidate — identical layout, so the transform is
# currently the identity; kept symbolic in case the reference differs.
_TRANSFORMS = {
    "none": lambda x: x,
    "lstm_gate_order": lambda x: x,
    "expand_last": lambda x: x[:, None] if x.ndim == 1 else x,
}


def load_tf_variables(prefix: str) -> Dict[str, np.ndarray]:
    import tensorflow as tf  # gated heavy import

    reader = tf.train.load_checkpoint(prefix)
    shapes = reader.get_variable_to_shape_map()
    return {name: reader.get_tensor(name) for name in shapes}


def convert(tf_vars: Dict[str, np.ndarray]) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """Returns (flat jax-path → array, unresolved jax paths)."""
    out: Dict[str, np.ndarray] = {}
    missing: List[str] = []
    for jax_path, candidates, transform in NAME_MAP:
        found = None
        for cand in candidates:
            for tf_name in tf_vars:
                if tf_name == cand or re.fullmatch(cand.replace("{i}", r"\d+"), tf_name):
                    found = tf_vars[tf_name]
                    break
            if found is not None:
                break
        if found is None:
            missing.append(jax_path)
            continue
        out[jax_path] = _TRANSFORMS[transform](np.asarray(found))
    return out, missing


def unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, value in flat.items():
        node = tree
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def merge_into_params(params: Dict, msgpack_path: str):
    """Overlay a converted (partial) tree onto an initialized params tree.

    Returns ``(merged_params, loaded_paths, skipped_paths)``. Leaves present
    in the msgpack but absent (or shape-mismatched) in ``params`` are
    skipped and reported rather than failing, so a partially-mapped
    checkpoint still warm-starts the mapped submodules.
    """
    import flax.serialization

    with open(msgpack_path, "rb") as f:
        donor = flax.serialization.msgpack_restore(f.read())

    loaded: List[str] = []
    skipped: List[str] = []

    def _merge(dst, src, prefix=""):
        out = dict(dst)
        for key, value in src.items():
            path = f"{prefix}/{key}" if prefix else key
            if key not in dst:
                skipped.append(path + " (not in model)")
            elif isinstance(value, dict):
                out[key] = _merge(dst[key], value, path)
            elif tuple(np.shape(dst[key])) != tuple(np.shape(value)):
                skipped.append(
                    f"{path} (shape {np.shape(value)} != model {np.shape(dst[key])})"
                )
            else:
                out[key] = np.asarray(value, dtype=np.asarray(dst[key]).dtype)
                loaded.append(path)
        return out

    return _merge(params, donor), loaded, skipped


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("tf_ckpt_prefix")
    p.add_argument("out_path", nargs="?")
    p.add_argument("--list-only", action="store_true")
    args = p.parse_args()

    tf_vars = load_tf_variables(args.tf_ckpt_prefix)
    if args.list_only:
        for name in sorted(tf_vars):
            print(name, tf_vars[name].shape)
        return
    if not args.out_path:
        sys.exit("out_path required unless --list-only")

    flat, missing = convert(tf_vars)
    for path in missing:
        print(f"WARNING: no TF variable matched {path!r} — update NAME_MAP")
    import flax.serialization

    data = flax.serialization.msgpack_serialize(unflatten(flat))
    with open(args.out_path, "wb") as f:
        f.write(data)
    print(f"wrote {len(flat)} tensors → {args.out_path} ({len(missing)} unresolved)")


if __name__ == "__main__":
    main()
