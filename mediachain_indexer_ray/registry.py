"""Dedupe model registry (SURVEY.md X1) — the analog of the reference's
``VECTORS_MODEL_NAMES`` dict + ``duplicate_mode`` selection
(``[ref: mc_models.py VECTORS_MODEL_NAMES — unverified]``):

* ``"baseline"``   — exact-signature blocking only (the reference's
  ``VectorsBaseline``: one exact hash term per doc). Here: digest groupby;
  no LSH, no pairwise scoring — only exact-content duplicates cluster.
* ``"baseline_ng"`` — n-gram/LSH blocking + pairwise rerank (the reference's
  ``VectorsBaselineNG``; the default). Here: MinHash-LSH bands + the
  PairScorer cascade.

New strategies plug in by registering a model spec; the pipeline looks up
``Config.duplicate_mode`` here, so adding a model never touches the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from mediachain_indexer_ray.stages.scoring import PairScorer


@dataclass(frozen=True)
class DedupeModel:
    name: str
    use_lsh: bool                    # emit MinHash-LSH candidate pairs?
    scorer_cls: type | None          # callable-class for the actor pool (None = no rerank)
    description: str = ""


REGISTRY: dict[str, DedupeModel] = {}


def register(model: DedupeModel) -> DedupeModel:
    REGISTRY[model.name] = model
    return model


register(
    DedupeModel(
        name="baseline",
        use_lsh=False,
        scorer_cls=None,
        description="exact content-digest blocking only (ref VectorsBaseline)",
    )
)
register(
    DedupeModel(
        name="baseline_ng",
        use_lsh=True,
        scorer_cls=PairScorer,
        description="MinHash-LSH banding + cascade pairwise rerank "
        "(ref VectorsBaselineNG)",
    )
)


def get_model(name: str) -> DedupeModel:
    try:
        return REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown duplicate_mode {name!r}; registered: {sorted(REGISTRY)}"
        ) from None
