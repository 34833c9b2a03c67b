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


def posthoc_chi_square(contingency: pd.DataFrame,
                       correction: str = "fdr_bh") -> pd.DataFrame:
    """Pairwise post-hoc chi² over row pairs of a contingency table with
    multiple-testing correction (analytic_utils.py:199-244: omnibus chi²
    then per-row-pair chi² + correction; statsmodels is unavailable, so
    Benjamini–Hochberg ('fdr_bh') and Bonferroni are hand-rolled).

    Input rows are the groups (e.g. ontologies); columns are counts.
    Returns the reference's result shape: comparison / original_pvalue /
    corrected_pvalue / reject_h0, alpha = 0.05."""
    from itertools import combinations

    if correction not in ("fdr_bh", "bonferroni"):
        raise ValueError("correction must be 'fdr_bh' or 'bonferroni'")
    idx = list(contingency.index)
    combos = list(combinations(idx, 2))
    pvals = []
    for a, b in combos:
        sub = contingency.loc[[a, b]].to_numpy()
        # drop all-zero columns (chi² undefined on empty margins)
        sub = sub[:, sub.sum(axis=0) > 0]
        _stat, _dof, p = chi_square(sub)
        pvals.append(p)
    m = len(pvals)
    p_arr = np.asarray(pvals, dtype=np.float64)
    alpha = 0.05
    if m == 0:
        corrected = p_arr
        reject = np.zeros(0, dtype=bool)
    elif correction == "bonferroni":
        corrected = np.minimum(p_arr * m, 1.0)
        reject = corrected < alpha
    else:  # Benjamini-Hochberg step-up
        order = np.argsort(p_arr, kind="stable")
        ranked = p_arr[order] * m / (np.arange(m) + 1)
        # enforce monotonicity from the largest rank down
        ranked = np.minimum.accumulate(ranked[::-1])[::-1]
        corrected = np.empty(m)
        corrected[order] = np.minimum(ranked, 1.0)
        reject = corrected < alpha
    return pd.DataFrame({
        "comparison": ["-".join(map(str, c)) for c in combos],
        "original_pvalue": pvals,
        "corrected_pvalue": corrected,
        "reject_h0": reject,
    })


def min_max_scale(scores: list[list[float]]) -> list[list[float]]:
    """Per-row min-max scaling to [0, 1] (analytic_utils.py:288-297's
    sklearn MinMaxScaler loop, vectorized per row; constant rows → 0)."""
    out = []
    for row in scores:
        x = np.asarray(row, dtype=np.float64)
        span = x.max() - x.min()
        out.append(((x - x.min()) / span).tolist() if span > 0
                   else np.zeros_like(x).tolist())
    return out
