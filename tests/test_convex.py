"""Convex-polytope narrowphase (collision/convex.py): GJK+SAT kernel
accuracy against analytic primitive kernels, penetration sign/depth,
envelope gradients, swept union-hull casts, and the unified-narrowphase
scene flag.  Mirrors the reference's convex-shape collision model
(tesseract converts URDF meshes to convex shapes; trajopt's formulation
is signed distance between convex bodies)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajopt_tpu.collision import geometry as geom
from trajopt_tpu.collision.convex import convex_convex, hull_of
from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.models.robots import boxbot


def _box_verts(half, center=(0.0, 0.0, 0.0)):
    h = np.asarray(half, float)
    c = np.asarray(center, float)
    return np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                     for sz in (-1, 1)]) * h + c


BOX_NORMALS = np.eye(3)


def _kernel(Va, ra, Vb, rb, Na=None, Nb=None):
    Na = np.zeros((0, 3)) if Na is None else np.asarray(Na, float)
    Nb = np.zeros((0, 3)) if Nb is None else np.asarray(Nb, float)
    axes = jnp.asarray(np.concatenate([Na, Nb]) if (len(Na) + len(Nb))
                       else np.zeros((1, 3)))
    valid = jnp.asarray(np.ones(axes.shape[0], bool)
                        if (len(Na) + len(Nb)) else np.zeros(1, bool))
    return float(convex_convex(jnp.asarray(Va, jnp.float64), ra,
                               jnp.asarray(Vb, jnp.float64), rb,
                               axes, valid))


def test_sphere_sphere_via_vertex_form():
    # spheres = 1 vertex + radius; separated and penetrating
    d = _kernel(np.zeros((1, 3)), 0.5, np.array([[2.0, 0, 0]]), 0.3)
    np.testing.assert_allclose(d, 1.2, atol=1e-9)
    d = _kernel(np.zeros((1, 3)), 0.5, np.array([[0.6, 0, 0]]), 0.3)
    np.testing.assert_allclose(d, -0.2, atol=1e-9)  # centroid axis


def test_capsule_box_matches_analytic():
    a = np.array([[-0.3, 0.0, 0.0], [0.3, 0.0, 0.0]])
    r = 0.1
    bx = _box_verts([0.2, 0.2, 0.2], [0.0, 0.0, 1.0])
    d = _kernel(a, r, bx, 0.0, None, BOX_NORMALS)
    ref = float(geom.capsule_box(jnp.asarray(a[0]), jnp.asarray(a[1]), r,
                                 jnp.eye(3), jnp.asarray([0.0, 0.0, 1.0]),
                                 jnp.asarray([0.2, 0.2, 0.2])))
    np.testing.assert_allclose(d, ref, atol=1e-6)


def test_box_box_separation_and_penetration():
    a = _box_verts([0.5, 0.5, 0.5])
    for off, expect in [(1.6, 0.6), (1.1, 0.1), (0.8, -0.2), (0.5, -0.5)]:
        b = _box_verts([0.5, 0.5, 0.5], [off, 0.0, 0.0])
        d = _kernel(a, 0.0, b, 0.0, BOX_NORMALS, BOX_NORMALS)
        np.testing.assert_allclose(d, expect, atol=1e-7)


def test_hull_distance_matches_support_qp():
    """Random hulls: kernel distance equals the brute-force support QP to
    ~1e-5 (GJK exactness on polytopes)."""
    rng = np.random.default_rng(3)
    for _ in range(4):
        A, Na = hull_of(rng.normal(size=(40, 3)))
        B, Nb = hull_of(rng.normal(size=(40, 3)) + np.array([4.0, 0.5, 0]))
        d = _kernel(A, 0.0, B, 0.0, Na, Nb)
        # long-run Frank-Wolfe reference
        wa = np.ones(len(A)) / len(A)
        wb = np.ones(len(B)) / len(B)
        for _k in range(20000):
            z = wa @ A - wb @ B
            ia = int(np.argmin(A @ z))
            ib = int(np.argmax(B @ z))
            s = A[ia] - B[ib]
            zs = z - s
            g = np.clip((z @ zs) / max(zs @ zs, 1e-30), 0, 1)
            da = np.zeros(len(A))
            da[ia] = 1
            db = np.zeros(len(B))
            db[ib] = 1
            wa = (1 - g) * wa + g * da
            wb = (1 - g) * wb + g * db
        dref = np.linalg.norm(wa @ A - wb @ B)
        assert d <= dref + 1e-9  # GJK at least as tight as FW
        assert abs(d - dref) < 5e-4


def test_envelope_gradient_matches_fd():
    rng = np.random.default_rng(1)
    A, Na = hull_of(rng.normal(size=(30, 3)))
    B0, Nb = hull_of(rng.normal(size=(30, 3)))
    axes = jnp.asarray(np.concatenate([Na, Nb]))
    valid = jnp.ones(axes.shape[0], bool)

    def f(t):
        return convex_convex(jnp.asarray(A), 0.0, jnp.asarray(B0) + t,
                             0.0, axes, valid)

    t0 = jnp.asarray([3.5, 0.4, -0.2])
    g = np.asarray(jax.grad(f)(t0))
    eps = 1e-6
    fd = [(float(f(t0 + eps * jnp.eye(3)[i]))
           - float(f(t0 - eps * jnp.eye(3)[i]))) / (2 * eps)
          for i in range(3)]
    np.testing.assert_allclose(g, fd, atol=1e-4)
    assert np.all(np.isfinite(g))


def test_scene_convex_discrete_swept_and_jacs():
    """Scene-level paths: distances / distances_and_jac /
    swept_distances(_and_jac) over mixed convex + primitive pairs, FD
    checked (covered in detail by the smoke in test_collision; here the
    hull-vs-hull and hull-vs-box routes)."""
    scene = CollisionScene(boxbot())
    cube = _box_verts([0.2, 0.2, 0.2])
    scene.add_link_convex("boxbot_link", cube)
    scene.add_world_box("wbox", [0.5, 0.5, 0.5], [2.0, 0.0, 0.0])
    scene.add_world_convex("whull", cube * 2 + np.array([-2.5, 0.0, 0.0]))
    q = jnp.asarray([0.0, 0.0])
    d = np.asarray(scene.distances(q))
    np.testing.assert_allclose(np.sort(d), [1.3, 1.9], atol=1e-6)
    dj, J = scene.distances_and_jac(q)
    np.testing.assert_allclose(np.asarray(dj), np.asarray(d), atol=1e-9)
    eps = 1e-6
    for i in range(2):
        dq = np.zeros(2)
        dq[i] = eps
        fd = (np.asarray(scene.distances(q + jnp.asarray(dq)))
              - np.asarray(scene.distances(q - jnp.asarray(dq)))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J)[:, i], fd, atol=1e-5)
    # swept: moving hull crosses in front of the box -> union hull is
    # exactly the swept volume (translation)
    q0 = jnp.asarray([0.0, -1.0])
    q1 = jnp.asarray([0.0, 1.0])
    ds, J0, J1 = scene.swept_distances_and_jac(q0, q1)
    np.testing.assert_allclose(np.asarray(ds),
                               np.asarray(scene.swept_distances(q0, q1)),
                               atol=1e-9)
    assert np.all(np.isfinite(np.asarray(J0)))
    assert np.all(np.isfinite(np.asarray(J1)))


def test_unified_narrowphase_matches_grouped_near_contact():
    from trajopt_tpu.models.robots import pr2ish, pr2ish_scene

    sc = pr2ish_scene()
    su = pr2ish_scene()
    su.unify_narrowphase = True
    tree = pr2ish()
    rng = np.random.default_rng(0)
    for _ in range(2):
        q = jnp.asarray(rng.uniform(tree.lower + 0.05, tree.upper - 0.05))
        d1 = np.asarray(sc.distances(q))
        d2 = np.asarray(su.distances(q))
        m = d1 > -0.02  # near contact / separated: kernels must agree
        assert np.abs(d1 - d2)[m].max() < 5e-4
        # deep penetration may differ (SAT vs analytic MTV) but the SIGN
        # must agree
        assert np.all((d1 < 0) == (d2 < 0) | m)


def test_mesh_hull_import_distance_sanity():
    """URDF mesh -> hull import (scene_from_urdf mesh_mode='hull') is
    covered by tests/test_mesh_urdf.py against the reference URDFs;
    here: hull_of returns a closed vertex/normal set for a box mesh."""
    from trajopt_tpu.collision import decompose as dc

    m = dc.box_mesh([0.2, 0.3, 0.4])
    hv, normals = hull_of(m.vertices)
    assert hv.shape[0] == 8
    assert 3 <= normals.shape[0] <= 6
    d = _kernel(hv, 0.0, _box_verts([0.1] * 3, [2.0, 0, 0]), 0.0,
                normals, BOX_NORMALS)
    np.testing.assert_allclose(d, 2.0 - 0.2 - 0.1, atol=1e-6)
