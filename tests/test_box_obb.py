"""Exact OBB-OBB narrowphase tests (geom.box_box).

Separation is validated against alternating projections between the two
boxes (von Neumann alternating projections converge to the closest pair of
two convex sets — an independent exact reference); penetration against a
direct SAT computation; continuity and gradients near contact.

Replaces the rotated-AABB conservatism of box_box_axis_aligned
(reference: tesseract contact managers return true convex-convex results,
consumed at trajopt/src/collision_terms.cpp contact queries).
"""

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.collision import geometry as geom

V = jnp.asarray


def _rotmat(axis, angle):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def _ref_distance(R0, p0, h0, R1, p1, h1, iters=20000):
    """Alternating projections: u* = argmin_{|u|<=h0} ||R0 u + p0 - y||."""
    u = np.zeros(3)
    v = np.zeros(3)
    for _ in range(iters):
        y = R1 @ v + p1
        u = np.clip(R0.T @ (y - p0), -h0, h0)
        x = R0 @ u + p0
        v = np.clip(R1.T @ (x - p1), -h1, h1)
    return float(np.linalg.norm(R0 @ u + p0 - (R1 @ v + p1)))


def _ref_sat_depth(R0, p0, h0, R1, p1, h1):
    axes = list(R0.T) + list(R1.T)
    for i in range(3):
        for j in range(3):
            c = np.cross(R0[:, i], R1[:, j])
            n = np.linalg.norm(c)
            if n > 1e-9:
                axes.append(c / n)
    best = np.inf
    for a in axes:
        r0 = np.abs(a @ R0) @ h0
        r1 = np.abs(a @ R1) @ h1
        best = min(best, r0 + r1 - abs(a @ (p1 - p0)))
    return best


def test_obb_separated_random_vs_alternating_projections():
    rng = np.random.default_rng(0)
    n_checked = 0
    while n_checked < 12:
        h0 = rng.uniform(0.2, 1.0, 3)
        h1 = rng.uniform(0.2, 1.0, 3)
        R0 = _rotmat(rng.normal(size=3), rng.uniform(0, np.pi))
        R1 = _rotmat(rng.normal(size=3), rng.uniform(0, np.pi))
        p0 = rng.uniform(-0.5, 0.5, 3)
        p1 = p0 + rng.normal(size=3) * 2.5
        if _ref_sat_depth(R0, p0, h0, R1, p1, h1) > -1e-3:
            continue  # overlapping/near-touching; separated case only
        d = float(geom.box_box(V(R0), V(p0), V(h0), V(R1), V(p1), V(h1)))
        d_ref = _ref_distance(R0, p0, h0, R1, p1, h1)
        np.testing.assert_allclose(d, d_ref, atol=1e-6)
        n_checked += 1


def test_obb_penetration_matches_sat():
    rng = np.random.default_rng(1)
    n_checked = 0
    while n_checked < 12:
        h0 = rng.uniform(0.3, 1.0, 3)
        h1 = rng.uniform(0.3, 1.0, 3)
        R0 = _rotmat(rng.normal(size=3), rng.uniform(0, np.pi))
        R1 = _rotmat(rng.normal(size=3), rng.uniform(0, np.pi))
        p0 = np.zeros(3)
        p1 = rng.normal(size=3) * 0.3
        depth = _ref_sat_depth(R0, p0, h0, R1, p1, h1)
        if depth < 1e-3:
            continue  # want clearly overlapping pairs
        d = float(geom.box_box(V(R0), V(p0), V(h0), V(R1), V(p1), V(h1)))
        np.testing.assert_allclose(d, -depth, atol=1e-9)
        n_checked += 1


def test_obb_matches_aabb_formula_when_axis_aligned():
    for delta in ([2.0, 0, 0], [0.6, 0, 0], [0.9, 0.9, 0.0]):
        a = geom.box_box(jnp.eye(3), V([0.0, 0, 0]), V([0.5, 0.5, 0.5]),
                         jnp.eye(3), V(delta), V([0.5, 0.5, 0.5]))
        b = geom.box_box_axis_aligned(
            jnp.eye(3), V([0.0, 0, 0]), V([0.5, 0.5, 0.5]),
            jnp.eye(3), V(delta), V([0.5, 0.5, 0.5]))
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_obb_tighter_than_rotated_aabb():
    # 45-degree rotated cube: the AABB bound inflates it by sqrt(2); the
    # exact kernel sees the true corner-on gap.
    R1np = _rotmat([0, 0, 1], np.pi / 4)
    hnp = np.array([0.5, 0.5, 0.5])
    # diagonal offset: closest features are the vertical edges of the two
    # boxes (edge-edge case, where the rotated-AABB bound is loosest)
    p1np = np.array([1.5, 1.5, 0.0])
    d_exact = float(geom.box_box(jnp.eye(3), jnp.zeros(3), V(hnp),
                                 V(R1np), V(p1np), V(hnp)))
    d_aabb = float(geom.box_box_axis_aligned(jnp.eye(3), jnp.zeros(3), V(hnp),
                                             V(R1np), V(p1np), V(hnp)))
    d_ref = _ref_distance(np.eye(3), np.zeros(3), hnp, R1np, p1np, hnp)
    np.testing.assert_allclose(d_exact, d_ref, atol=1e-6)
    assert d_aabb < d_exact - 0.2  # AABB form is strictly conservative here


def test_obb_continuity_and_gradient_at_contact():
    R1 = V(_rotmat([1, 1, 0], 0.3))
    h = V([0.5, 0.4, 0.3])

    def f(x):
        return geom.box_box(jnp.eye(3), jnp.zeros(3), h,
                            R1, jnp.array([x, 0.1, 0.05]), h)

    # signed distance is continuous and monotone through contact
    xs = jnp.linspace(0.4, 1.6, 121)
    ds = jax.vmap(f)(xs)
    assert np.all(np.diff(np.asarray(ds)) > -1e-9)
    assert float(jnp.min(jnp.abs(ds))) < 0.03  # crosses zero in the sweep
    # gradient finite and matches FD away from kinks
    for x0 in (0.6, 1.5):
        g = float(jax.grad(f)(jnp.asarray(x0)))
        fd = float((f(x0 + 1e-6) - f(x0 - 1e-6)) / 2e-6)
        assert np.isfinite(g)
        np.testing.assert_allclose(g, fd, atol=1e-4)


def test_scene_routes_rotated_box_pairs_to_exact_kernel():
    from trajopt_tpu.collision.world import CollisionScene
    from trajopt_tpu.models.robots import boxbot

    tree = boxbot()  # prismatic-only: orientation-constant links
    s = CollisionScene(tree, check_self_collision=False)
    s.add_link_box("boxbot_link", [0.5, 0.5, 0.5])
    s.add_world_box("aligned", [0.5, 0.5, 0.5], center=[3.0, 0, 0])
    s.add_world_box("rotated", [0.5, 0.5, 0.5], center=[0.0, 3.0, 0],
                    R=_rotmat([0, 0, 1], np.pi / 4))
    keys = {key for key, _, _, _ in s._pair_groups()}
    assert ("box", "box") in keys    # aligned pair -> cheap formula
    assert ("box", "obb") in keys    # rotated pair -> exact kernel
    q = jnp.zeros(2)
    ds = np.asarray(s.distances(q))
    np.testing.assert_allclose(ds[0], 2.0, atol=1e-9)
    np.testing.assert_allclose(ds[1], 3.0 - 0.5 - 0.5 * np.sqrt(2), atol=1e-9)
