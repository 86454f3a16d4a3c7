"""Corpus name → recipe mapping (reference ``datasets/dataset_factory.py``).

Reference: SURVEY.md §2.1 "Dataset factory" [M] — reconstructed; mount
empty. Maps ``hparams.dataset`` / the CLI ``--dataset`` flag to the
preprocessor class; the online pipeline is corpus-independent
(:class:`...data.dataset.TacotronDataset`).
"""

from __future__ import annotations

from self_attention_tacotron_tpu.data.japanese import JapanesePitchAccent
from self_attention_tacotron_tpu.data.ljspeech import LJSpeech
from self_attention_tacotron_tpu.data.synthetic import SyntheticCorpus
from self_attention_tacotron_tpu.data.vctk import VCTK

_CORPORA = {
    "ljspeech": LJSpeech,
    "vctk": VCTK,
    "japanese": JapanesePitchAccent,
    "jsut": JapanesePitchAccent,
    "synthetic": SyntheticCorpus,
}


def dataset_factory(name: str):
    try:
        return _CORPORA[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown dataset {name!r}; known: {sorted(_CORPORA)}"
        ) from None
