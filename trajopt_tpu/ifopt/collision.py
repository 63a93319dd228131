"""Facade collision constraints for the ifopt component model.

The reference's fixed-size collision constraints
(``trajopt_ifopt/src/constraints/collision/discrete_collision_constraint
.cpp:60-272`` and ``continuous_collision_constraint.cpp``): rows are LINK
pairs, pinned to ``max_num_cnt`` (``TrajOptCollisionConfig``,
``collision_types.h:156-162``, default 3); each row's VALUE is the worst
member error ``coeff * (margin - d)`` over the link pair's contact set,
and its JACOBIAN is the error-weighted average of the member gradients
(``weighted_average_methods.cpp:31-108``) — autodiff of the row value
would give the argmax member's gradient instead, so these sets carry an
analytic ``jacobian`` and the facade lowering wires it through.

The continuous variant casts between two adjacent position variables with
optional LVS sub-segmentation: contacts from every sub-segment merge into
the link pair's set before aggregation, exactly like
``LVSContinuousCollisionEvaluator`` merging sub-state results into one
``GradientResultsSet``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.ifopt import BoundSmallerZero, ConstraintSet, Var
from trajopt_tpu.terms.collision import _link_pair_partition

__all__ = ["DiscreteCollisionConstraint", "ContinuousCollisionConstraint"]


class _CollisionConstraintBase(ConstraintSet):
    def __init__(self, scene: CollisionScene, margin: float, coeff: float,
                 max_num_cnt: int | None, safety_margin_buffer: float,
                 name: str):
        lp_index, n_lp = _link_pair_partition(scene)
        rows = n_lp if max_num_cnt is None else min(int(max_num_cnt), n_lp)
        super().__init__(rows, name, BoundSmallerZero)
        self.scene = scene
        self.margin = float(margin)
        self.coeff = float(coeff)
        self.buffer = float(safety_margin_buffer)
        self._lp = jnp.asarray(lp_index)
        self._n_lp = n_lp
        self._topk = rows < n_lp

    # -- link-pair aggregation (weighted_average_methods.cpp:31-108) --
    def _agg_values(self, err):
        """err [P] coeff-scaled errors -> [rows] worst member per link
        pair, top-k capped."""
        rows = jax.ops.segment_max(err, self._lp, num_segments=self._n_lp)
        if self._topk:
            rows, _ = jax.lax.top_k(rows, self.rows)
        return rows

    def _agg_rows(self, err, jacs):
        """(values [rows], averaged jacs per link pair, top-k aligned).

        jacs: tuple of [P, D] member-gradient blocks sharing the weights
        (one block for discrete, two endpoint blocks for continuous)."""
        w = jnp.maximum(err + self.coeff * self.buffer, 0.0)      # [P]
        tot = jax.ops.segment_sum(w, self._lp, num_segments=self._n_lp)
        safe = jnp.where(tot > 0.0, tot, 1.0)
        vals = jax.ops.segment_max(err, self._lp, num_segments=self._n_lp)
        out = []
        for J in jacs:
            num = jax.ops.segment_sum(w[:, None] * J, self._lp,
                                      num_segments=self._n_lp)
            out.append(jnp.where((tot > 0.0)[:, None], num / safe[:, None],
                                 0.0))
        if self._topk:
            vals, idx = jax.lax.top_k(vals, self.rows)
            out = [jnp.take(J, idx, axis=0) for J in out]
        return vals, out


class DiscreteCollisionConstraint(_CollisionConstraintBase):
    """Fixed-size discrete collision constraint on ONE position variable
    (discrete_collision_constraint.cpp:60-272): rows <= max_num_cnt link
    pairs with value coeff*(margin - d_worst) <= 0 and error-weighted-
    average analytic Jacobians."""

    def __init__(self, scene: CollisionScene, position_var: Var, *,
                 margin: float = 0.025, coeff: float = 20.0,
                 max_num_cnt: int | None = 3,
                 safety_margin_buffer: float = 0.0,
                 name: str = "discrete_collision"):
        super().__init__(scene, margin, coeff, max_num_cnt,
                         safety_margin_buffer, name)
        self._var = position_var

    def values(self, vars):  # noqa: A002
        q = vars[self._var]
        d = self.scene.distances(q)
        return self._agg_values(self.coeff * (self.margin - d))

    def jacobian(self, vars):  # noqa: A002
        x = vars.flat
        q = vars[self._var]
        d, J = self.scene.distances_and_jac(q)
        err = self.coeff * (self.margin - d)
        _, (Jrows,) = self._agg_rows(err, (-self.coeff * J,))
        out = jnp.zeros((self.rows, x.shape[0]), x.dtype)
        return jax.lax.dynamic_update_slice(out, Jrows.astype(x.dtype),
                                            (0, self._var.start))


class ContinuousCollisionConstraint(_CollisionConstraintBase):
    """Fixed-size continuous (cast/swept) collision constraint between TWO
    adjacent position variables (continuous_collision_constraint.cpp):
    sub-segment contact sets merge per link pair before the weighted-
    average aggregation (the LVSContinuousCollisionEvaluator role)."""

    def __init__(self, scene: CollisionScene, position_var0: Var,
                 position_var1: Var, *, margin: float = 0.025,
                 coeff: float = 20.0, max_num_cnt: int | None = 3,
                 lvs_substeps: int = 1, safety_margin_buffer: float = 0.0,
                 name: str = "continuous_collision"):
        super().__init__(scene, margin, coeff, max_num_cnt,
                         safety_margin_buffer, name)
        self._var0 = position_var0
        self._var1 = position_var1
        self._fr = np.linspace(0.0, 1.0, int(lvs_substeps) + 1)

    def _sub_dists(self, q0, q1):
        """[n_sub, P] swept distances over the LVS sub-segments."""
        dq = q1 - q0
        fa = jnp.asarray(self._fr[:-1], q0.dtype)
        fb = jnp.asarray(self._fr[1:], q0.dtype)
        return jax.vmap(lambda a, b: self.scene.swept_distances(
            q0 + a * dq, q0 + b * dq))(fa, fb)

    def values(self, vars):  # noqa: A002
        q0 = vars[self._var0]
        q1 = vars[self._var1]
        d = jnp.min(self._sub_dists(q0, q1), axis=0)   # merge sub-segments
        return self._agg_values(self.coeff * (self.margin - d))

    def jacobian(self, vars):  # noqa: A002
        x = vars.flat
        q0 = vars[self._var0]
        q1 = vars[self._var1]
        dq = q1 - q0
        fa = jnp.asarray(self._fr[:-1], q0.dtype)
        fb = jnp.asarray(self._fr[1:], q0.dtype)

        def sub(a, b):
            d, Ja, Jb = self.scene.swept_distances_and_jac(
                q0 + a * dq, q0 + b * dq)
            # chain through the affine interpolation endpoints
            return d, (1.0 - a) * Ja + (1.0 - b) * Jb, a * Ja + b * Jb

        d_s, J0_s, J1_s = jax.vmap(sub)(fa, fb)        # [n_sub, P(, D)]
        # per-pair worst sub-segment carries the contact (merged set)
        k = jnp.argmin(d_s, axis=0)                     # [P]
        take = lambda A: jnp.take_along_axis(  # noqa: E731
            A, k[None, :, None], axis=0)[0]
        d = jnp.take_along_axis(d_s, k[None, :], axis=0)[0]
        err = self.coeff * (self.margin - d)
        _, (R0, R1) = self._agg_rows(err, (-self.coeff * take(J0_s),
                                           -self.coeff * take(J1_s)))
        out = jnp.zeros((self.rows, x.shape[0]), x.dtype)
        out = jax.lax.dynamic_update_slice(out, R0.astype(x.dtype),
                                           (0, self._var0.start))
        return jax.lax.dynamic_update_slice(out, R1.astype(x.dtype),
                                            (0, self._var1.start))
