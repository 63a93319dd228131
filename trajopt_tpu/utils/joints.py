"""Joint-name set mapping utilities.

Analog of the reference's superset/subset joint-value mapping
(``trajopt/include/trajopt/utils.hpp:14-69``: ``getSubset`` /
``updateFromSubset``, used by the AvoidSingularitySubset calculators and by
planners gluing differently-ordered joint groups together).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def subset_indices(superset_names: Sequence[str],
                   subset_names: Sequence[str]) -> np.ndarray:
    """Index of each subset joint within the superset (static)."""
    lookup = {n: i for i, n in enumerate(superset_names)}
    missing = [n for n in subset_names if n not in lookup]
    if missing:
        raise KeyError(f"joints {missing} not in superset")
    return np.array([lookup[n] for n in subset_names])


def get_subset(superset_names, values, subset_names):
    """Extract subset joint values from superset values (getSubset)."""
    idx = subset_indices(superset_names, subset_names)
    return jnp.asarray(values)[..., idx]


def update_from_subset(superset_names, superset_values, subset_names,
                       subset_values):
    """Write subset values into a copy of the superset values
    (updateFromSubset)."""
    idx = subset_indices(superset_names, subset_names)
    return jnp.asarray(superset_values).at[..., idx].set(
        jnp.asarray(subset_values))


def expand_jacobian_rows(superset_names, subset_names, J_subset):
    """Scatter a [rows, len(subset)] Jacobian into [rows, len(superset)]
    (zero elsewhere) — the AvoidSingularitySubsetJacCalculator pattern."""
    idx = subset_indices(superset_names, subset_names)
    J_subset = jnp.asarray(J_subset)
    out = jnp.zeros(J_subset.shape[:-1] + (len(superset_names),),
                    J_subset.dtype)
    return out.at[..., idx].set(J_subset)
