"""The Pile per-subset perplexity tasks (22 registry entries).

Reference: lm_eval/tasks/pile.py + lm_eval/datasets/pile/pile.py — each
task filters the Pile validation/test jsonl.zst dumps down to one
``meta.pile_set_name`` component and scores rolling perplexity.

The reference fetches ``val.jsonl.zst`` / ``test.jsonl.zst`` from the
the-eye.eu mirror via an HF dataset script.  Here the same files are read
with our zstd jsonl archive reader (owq_tpu.eval.archiver): pass
``data_dir`` (or set ``$OWQ_PILE_DIR``) pointing at a directory holding
``val.jsonl.zst`` and ``test.jsonl.zst``; plain ``.jsonl`` files are also
accepted.  Note the reference registry key ``pile_uspto`` maps to internal
subset name ``pile_upsto`` (reference typo); only the registry key is
meaningful, so we keep ``pile_uspto``.
"""

from __future__ import annotations

import os

from ..registry import register_task
from ..task import PerplexityTask

# registry suffix -> meta.pile_set_name (lm_eval/datasets/pile/pile.py:49-72)
PILE_SETS = {
    "pile_arxiv": "ArXiv",
    "pile_books3": "Books3",
    "pile_bookcorpus2": "BookCorpus2",
    "pile_dm-mathematics": "DM Mathematics",
    "pile_enron": "Enron Emails",
    "pile_europarl": "EuroParl",
    "pile_freelaw": "FreeLaw",
    "pile_github": "Github",
    "pile_gutenberg": "Gutenberg (PG-19)",
    "pile_hackernews": "HackerNews",
    "pile_nih-exporter": "NIH ExPorter",
    "pile_opensubtitles": "OpenSubtitles",
    "pile_openwebtext2": "OpenWebText2",
    "pile_philpapers": "PhilPapers",
    "pile_pile-cc": "Pile-CC",
    "pile_pubmed-abstracts": "PubMed Abstracts",
    "pile_pubmed-central": "PubMed Central",
    "pile_stackexchange": "StackExchange",
    "pile_uspto": "USPTO Backgrounds",
    "pile_ubuntu-irc": "Ubuntu IRC",
    "pile_wikipedia": "Wikipedia (en)",
    "pile_youtubesubtitles": "YoutubeSubtitles",
}


def _find(data_dir, stem):
    for name in (f"{stem}.jsonl.zst", f"{stem}.jsonl"):
        p = os.path.join(data_dir, name)
        if os.path.exists(p):
            return p
    return None


class PilePerplexityTask(PerplexityTask):
    VERSION = 1
    SET_NAME = "Pile-CC"

    def download(self, data_dir=None):
        self.data_dir = data_dir or os.environ.get("OWQ_PILE_DIR")
        if not self.data_dir:
            raise RuntimeError(
                "Pile tasks need local val/test dumps: pass data_dir or set "
                "OWQ_PILE_DIR to a directory with val.jsonl.zst and "
                "test.jsonl.zst (mirror: the-eye.eu/public/AI/pile/)")

    def _docs(self, stem):
        from ...archiver import Reader

        path = _find(self.data_dir, stem)
        if path is None:
            raise FileNotFoundError(
                f"{stem}.jsonl[.zst] not found in {self.data_dir}")
        reader = Reader()
        for text, meta in reader.read(path, get_meta=True):
            if meta.get("pile_set_name") == self.SET_NAME:
                yield text

    def has_validation_docs(self):
        return _find(self.data_dir, "val") is not None

    def has_test_docs(self):
        return _find(self.data_dir, "test") is not None

    def validation_docs(self):
        return self._docs("val")

    def test_docs(self):
        return self._docs("test")


for _key, _set in PILE_SETS.items():
    register_task(_key)(
        type(f"Pile_{_key.replace('-', '_')}", (PilePerplexityTask,),
             {"SET_NAME": _set}))
