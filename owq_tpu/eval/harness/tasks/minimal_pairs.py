"""Sentence-pair likelihood-comparison tasks: BLiMP and CrowS-Pairs.

Reference: lm_eval/tasks/blimp.py (67 minimal-pair subsets; acc = the
grammatical sentence scores a higher loglikelihood than the ungrammatical
one, both scored with an empty context) and lm_eval/tasks/crowspairs.py
(stereotype-pair scoring: pct_stereotype + absolute likelihood difference,
lower is better for both).
"""

from __future__ import annotations

from ..metrics import mean
from ..registry import register_task
from ..task import Request, Task
from . import _load


class _PairTask(Task):
    """Score two full sentences with empty context; compare."""

    VERSION = 0

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def fewshot_context(self, doc, num_fewshot, rnd):
        # zero-shot only, no prompt: the two sentences are scored bare
        # (reference blimp.py asserts num_fewshot == 0 and returns "").
        return ""

    def doc_to_text(self, doc):
        return ""

    def doc_to_target(self, doc):
        return ""


# --------------------------------------------------------------------------
# BLiMP: 67 subsets of 1000 minimal pairs (HF dataset "blimp", one config
# per linguistic phenomenon; registry key == config name).
# --------------------------------------------------------------------------

BLIMP_CONFIGS = [
    "adjunct_island", "anaphor_gender_agreement", "anaphor_number_agreement",
    "animate_subject_passive", "animate_subject_trans", "causative",
    "complex_NP_island", "coordinate_structure_constraint_complex_left_branch",
    "coordinate_structure_constraint_object_extraction",
    "determiner_noun_agreement_1", "determiner_noun_agreement_2",
    "determiner_noun_agreement_irregular_1",
    "determiner_noun_agreement_irregular_2",
    "determiner_noun_agreement_with_adj_2",
    "determiner_noun_agreement_with_adj_irregular_1",
    "determiner_noun_agreement_with_adj_irregular_2",
    "determiner_noun_agreement_with_adjective_1",
    "distractor_agreement_relational_noun",
    "distractor_agreement_relative_clause", "drop_argument",
    "ellipsis_n_bar_1", "ellipsis_n_bar_2",
    "existential_there_object_raising", "existential_there_quantifiers_1",
    "existential_there_quantifiers_2", "existential_there_subject_raising",
    "expletive_it_object_raising", "inchoative", "intransitive",
    "irregular_past_participle_adjectives", "irregular_past_participle_verbs",
    "irregular_plural_subject_verb_agreement_1",
    "irregular_plural_subject_verb_agreement_2",
    "left_branch_island_echo_question", "left_branch_island_simple_question",
    "matrix_question_npi_licensor_present", "npi_present_1", "npi_present_2",
    "only_npi_licensor_present", "only_npi_scope", "passive_1", "passive_2",
    "principle_A_c_command", "principle_A_case_1", "principle_A_case_2",
    "principle_A_domain_1", "principle_A_domain_2", "principle_A_domain_3",
    "principle_A_reconstruction", "regular_plural_subject_verb_agreement_1",
    "regular_plural_subject_verb_agreement_2",
    "sentential_negation_npi_licensor_present",
    "sentential_negation_npi_scope", "sentential_subject_island",
    "superlative_quantifiers_1", "superlative_quantifiers_2",
    "tough_vs_raising_1", "tough_vs_raising_2", "transitive", "wh_island",
    "wh_questions_object_gap", "wh_questions_subject_gap",
    "wh_questions_subject_gap_long_distance", "wh_vs_that_no_gap",
    "wh_vs_that_no_gap_long_distance", "wh_vs_that_with_gap",
    "wh_vs_that_with_gap_long_distance",
]


class BlimpTask(_PairTask):
    CONFIG = "adjunct_island"

    def download(self, data_dir=None):
        self.data = _load("blimp", self.CONFIG, data_dir=data_dir)

    def validation_docs(self):
        return self.data["train"]  # blimp ships a single "train" split

    def construct_requests(self, doc, ctx):
        return [Request("loglikelihood", ("", doc["sentence_good"])),
                Request("loglikelihood", ("", doc["sentence_bad"]))]

    def process_results(self, doc, results):
        (ll_good, _), (ll_bad, _) = results
        return {"acc": 1.0 if ll_good > ll_bad else 0.0}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}


for _c in BLIMP_CONFIGS:
    register_task(f"blimp_{_c}")(
        type(f"Blimp_{_c}", (BlimpTask,), {"CONFIG": _c}))


# --------------------------------------------------------------------------
# CrowS-Pairs (english + french, whole set + per-bias-type slices).
# Metric semantics per reference crowspairs.py:120-137: pct_stereotype is
# the fraction of pairs where the MORE stereotypical sentence is likelier;
# likelihood_difference is |ll_more - ll_less|.  Both lower-is-better.
# --------------------------------------------------------------------------

CROWS_BIAS_TYPES = {
    "race_color": "race-color",
    "socioeconomic": "socioeconomic",
    "gender": "gender",
    "age": "age",
    "religion": "religion",
    "disability": "disability",
    "sexual_orientation": "sexual-orientation",
    "nationality": "nationality",
    "physical_appearance": "physical-appearance",
    "autre": "autre",
}


class CrowsPairsTask(_PairTask):
    LANG = "english"
    BIAS_TYPE: str | None = None

    def download(self, data_dir=None):
        self.data = _load("BigScienceBiasEval/crows_pairs_multilingual",
                          self.LANG, data_dir=data_dir)

    def validation_docs(self):
        docs = self.data["test"]
        if self.BIAS_TYPE is not None:
            bias = self.BIAS_TYPE
            docs = docs.filter(lambda d: d["bias_type"].startswith(bias))
        return docs

    def construct_requests(self, doc, ctx):
        return [Request("loglikelihood", ("", doc["sent_more"])),
                Request("loglikelihood", ("", doc["sent_less"]))]

    def process_results(self, doc, results):
        (ll_more, _), (ll_less, _) = results
        return {"likelihood_difference": abs(ll_more - ll_less),
                "pct_stereotype": 1.0 if ll_more > ll_less else 0.0}

    def aggregation(self):
        return {"likelihood_difference": mean, "pct_stereotype": mean}

    def higher_is_better(self):
        return {"likelihood_difference": False, "pct_stereotype": False}


for _lang in ("english", "french"):
    register_task(f"crows_pairs_{_lang}")(
        type(f"CrowsPairs_{_lang}", (CrowsPairsTask,), {"LANG": _lang}))
    for _suffix, _bias in CROWS_BIAS_TYPES.items():
        register_task(f"crows_pairs_{_lang}_{_suffix}")(
            type(f"CrowsPairs_{_lang}_{_suffix}", (CrowsPairsTask,),
                 {"LANG": _lang, "BIAS_TYPE": _bias}))
