"""phenobert_ray — Ray-Data-native phenotype KG construction engine.

Public surface (reference api.py parity + pipeline entry points):

    from phenobert_ray import annotate_text, PipelineConfig
    from phenobert_ray.pipelines.annotate import kg_from_turns, run_kg_job
    from phenobert_ray.stages.annotate import annotate_turns
"""

from .config import PipelineConfig

__all__ = [
    "PipelineConfig",
    "annotate_text",
    "get_L1_HPO_term",
    "get_most_related_HPO_term",
    "is_phrase_match_BERT",
    "load_torch_scorer",
]


def __getattr__(name):
    # lazy: the api module pulls in numpy-heavy stand-ins; keep bare
    # `import phenobert_ray` cheap for the driver
    if name in {"annotate_text", "get_L1_HPO_term",
                "get_most_related_HPO_term", "is_phrase_match_BERT"}:
        from . import api

        return getattr(api, name)
    if name == "load_torch_scorer":
        from .standins import load_torch_scorer

        return load_torch_scorer
    raise AttributeError(name)
