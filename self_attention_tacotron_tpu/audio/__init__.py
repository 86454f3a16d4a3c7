"""Audio frontend: fused-XLA DSP plus the reference-parity ``Audio`` facade."""

from self_attention_tacotron_tpu.audio.audio import Audio
from self_attention_tacotron_tpu.audio import dsp

__all__ = ["Audio", "dsp"]
