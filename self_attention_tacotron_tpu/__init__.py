"""TPU-native Self-Attention Tacotron framework.

A brand-new JAX/XLA/Pallas implementation of the capability surface of
``nii-yamagishilab/self-attention-tacotron`` (Yasuda et al., ICASSP 2019,
arXiv:1810.11960) and its companion ``nii-yamagishilab/tacotron2`` module
library — redesigned TPU-first:

* fused XLA audio frontend (trim / STFT / mel filterbank / dB normalize)
* ZoneoutLSTM encoders + self-attention streams under ``lax.scan``
* additive / location-sensitive / forward / dual-source attention with all
  recursion state carried in scan carries (static shapes throughout)
* fully on-device batched autoregressive mel decoding with stop tokens
  (``lax.while_loop`` with per-lane termination masks, no host round trips)
* pjit / ``jax.sharding`` data-parallel training and batched synthesis
* orbax checkpointing with auto-resume

NOTE ON CITATIONS: the read-only reference mount at /root/reference was
EMPTY in every session so far (see SURVEY.md "PROVENANCE"), so docstrings
cite *expected* reference paths from SURVEY.md's reconstructed inventory
rather than verified file:line locations.
"""

__version__ = "0.1.0"

from self_attention_tacotron_tpu.hparams import HParams, default_hparams

__all__ = ["HParams", "default_hparams", "__version__"]
