"""Precomputed signed-distance voxel grids for complex static worlds.

TPU-native replacement for the reference's octree/octomap collision worlds
(``cast_cost_octomap_unit.cpp``: tesseract contact managers over octrees):
a static environment of arbitrary geometry is baked once into a regular
SDF grid; queries are trilinear interpolation — O(1), branch-free,
differentiable, and batchable, which is exactly what the TPU wants instead
of tree traversal.

Conservativeness: trilinear interpolation of an SDF under-/over-estimates
near surfaces by O(h^2 * curvature); choose the cell size h against the
collision margin (h <= margin works well in practice).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SdfGrid:
    """values[nx, ny, nz] sampled at origin + idx*spacing (cell corners)."""

    values: jax.Array
    origin: jax.Array    # [3]
    spacing: float

    def query(self, p: jax.Array) -> jax.Array:
        """Trilinear-interpolated signed distance at world point p [3].
        Outside the grid, falls back to distance-to-grid-box plus the
        boundary value (conservative for enclosed obstacles)."""
        vals = self.values
        nx, ny, nz = vals.shape
        rel = (p - self.origin) / self.spacing
        max_idx = jnp.asarray([nx - 1, ny - 1, nz - 1], rel.dtype)
        clamped = jnp.clip(rel, 0.0, max_idx)
        i0 = jnp.clip(jnp.floor(clamped).astype(jnp.int32), 0,
                      jnp.asarray([nx - 2, ny - 2, nz - 2]))
        f = clamped - i0
        x0, y0, z0 = i0[0], i0[1], i0[2]

        def v(dx, dy, dz):
            return vals[x0 + dx, y0 + dy, z0 + dz]

        c00 = v(0, 0, 0) * (1 - f[0]) + v(1, 0, 0) * f[0]
        c10 = v(0, 1, 0) * (1 - f[0]) + v(1, 1, 0) * f[0]
        c01 = v(0, 0, 1) * (1 - f[0]) + v(1, 0, 1) * f[0]
        c11 = v(0, 1, 1) * (1 - f[0]) + v(1, 1, 1) * f[0]
        c0 = c00 * (1 - f[1]) + c10 * f[1]
        c1 = c01 * (1 - f[1]) + c11 * f[1]
        inside_val = c0 * (1 - f[2]) + c1 * f[2]

        # outside the grid: add the Euclidean distance to the grid box
        out_vec = (rel - clamped) * self.spacing
        out_d = jnp.sqrt(jnp.sum(out_vec * out_vec) + 1e-12)
        return inside_val + out_d

    def query_many(self, ps: jax.Array) -> jax.Array:
        return jax.vmap(self.query)(ps)


def bake_sdf(distance_fn: Callable[[jax.Array], jax.Array],
             lower, upper, spacing: float) -> SdfGrid:
    """Sample ``distance_fn(point [3]) -> signed distance`` onto a grid
    spanning [lower, upper] (the role VHACD + octree construction plays for
    the reference: arbitrary world geometry -> fast collision queries)."""
    lower = np.asarray(lower, float)
    upper = np.asarray(upper, float)
    counts = np.maximum(np.ceil((upper - lower) / spacing).astype(int) + 1, 2)
    xs = [lower[i] + spacing * np.arange(counts[i]) for i in range(3)]
    pts = np.stack(np.meshgrid(*xs, indexing="ij"), axis=-1).reshape(-1, 3)
    vals = jax.vmap(distance_fn)(jnp.asarray(pts))
    values = jnp.asarray(vals).reshape(tuple(counts))
    return SdfGrid(values=values, origin=jnp.asarray(lower), spacing=spacing)


def sphere_sdf_distance(grid: SdfGrid, center: jax.Array, radius) -> jax.Array:
    """Signed distance of a sphere to the SDF world."""
    return grid.query(center) - radius


def capsule_sdf_distance(grid: SdfGrid, a: jax.Array, b: jax.Array, radius,
                         n_samples: int = 8) -> jax.Array:
    """Min SDF along the capsule axis minus radius (sampled; spacing-level
    accuracy like the LVS evaluators)."""
    ts = jnp.linspace(0.0, 1.0, n_samples)
    pts = a[None, :] + ts[:, None] * (b - a)[None, :]
    return jnp.min(grid.query_many(pts)) - radius
