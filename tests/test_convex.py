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
from trajopt_tpu.collision.convex import (convex_convex, edge_cross_axes,
                                          hull_of)
from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.models.robots import boxbot


def _box_verts(half, center=(0.0, 0.0, 0.0)):
    h = np.asarray(half, float)
    c = np.asarray(center, float)
    return np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                     for sz in (-1, 1)]) * h + c


BOX_NORMALS = np.eye(3)


def _kernel(Va, ra, Vb, rb, Na=None, Nb=None, Ea=None, Eb=None,
            dtype=jnp.float64):
    Na = np.zeros((0, 3)) if Na is None else np.asarray(Na, float)
    Nb = np.zeros((0, 3)) if Nb is None else np.asarray(Nb, float)
    axes = np.concatenate([Na, Nb]) if (len(Na) + len(Nb)) \
        else np.zeros((1, 3))
    valid = (np.ones(axes.shape[0], bool) if (len(Na) + len(Nb))
             else np.zeros(1, bool))
    if Ea is not None and Eb is not None and len(Ea) and len(Eb):
        cx, cxv = edge_cross_axes(jnp.asarray(Ea, dtype),
                                  jnp.ones(len(Ea), bool),
                                  jnp.asarray(Eb, dtype),
                                  jnp.ones(len(Eb), bool))
        axes = np.concatenate([axes, np.asarray(cx)])
        valid = np.concatenate([valid, np.asarray(cxv)])
    return float(convex_convex(jnp.asarray(Va, dtype), ra,
                               jnp.asarray(Vb, dtype), rb,
                               jnp.asarray(axes, dtype),
                               jnp.asarray(valid)))


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


def _hulls_overlap_lp(A, B):
    """Exact overlap certificate: LP feasibility of conv(A) n conv(B)
    (exists wa, wb on the simplices with A^T wa = B^T wb)."""
    from scipy.optimize import linprog

    nA, nB = len(A), len(B)
    Aeq = np.zeros((5, nA + nB))
    Aeq[0, :nA] = 1
    Aeq[1, nA:] = 1
    Aeq[2:, :nA] = A.T
    Aeq[2:, nA:] = -B.T
    beq = np.array([1.0, 1.0, 0.0, 0.0, 0.0])
    res = linprog(np.zeros(nA + nB), A_eq=Aeq, b_eq=beq,
                  bounds=[(0, None)] * (nA + nB), method="highs")
    return res.status == 0


def _sampled_depth(A, B, n=100000, seed=0):
    """Penetration depth of overlapping hulls by dense direction
    sampling + local refinement of max_u (support gap along u)."""
    rng = np.random.default_rng(seed)
    U = rng.normal(size=(n, 3))
    U /= np.linalg.norm(U, axis=1, keepdims=True)
    PA, PB = A @ U.T, B @ U.T
    gap = np.maximum(PB.min(0) - PA.max(0), PA.min(0) - PB.max(0))
    u = U[np.argmax(gap)]
    best = float(np.max(gap))
    for it in range(60):
        cand = u + 0.03 * rng.normal(size=(400, 3))
        cand /= np.linalg.norm(cand, axis=1, keepdims=True)
        g = np.maximum((B @ cand.T).min(0) - (A @ cand.T).max(0),
                       (A @ cand.T).min(0) - (B @ cand.T).max(0))
        j = int(np.argmax(g))
        if g[j] > best:
            best, u = float(g[j]), cand[j]
    return best  # negative = -depth


def test_hull_distance_matches_ground_truth():
    """Random hulls vs exact ground truth: an LP decides overlap; for
    separated pairs the kernel must match the independent long-run FW
    support-QP distance; for overlapping pairs it must report a
    penetration whose depth matches refined direction sampling.  (The
    round-3 red test compared the SIGNED kernel distance against the
    UNSIGNED FW minimum distance, which is ~0 but never negative on
    overlapping pairs — the seed-3 'false penetration' was in truth a
    genuinely overlapping pair, LP-verified, with depth 0.7397 matching
    the kernel.)"""
    rng = np.random.default_rng(3)
    n_sep = n_pen = 0
    for trial in range(6):
        A, Na, Ea = hull_of(rng.normal(size=(40, 3)))
        B, Nb, Eb = hull_of(rng.normal(size=(40, 3))
                            + np.array([4.0, 0.5, 0]))
        d = _kernel(A, 0.0, B, 0.0, Na, Nb, Ea, Eb)
        if _hulls_overlap_lp(A, B):
            n_pen += 1
            depth = _sampled_depth(A, B, seed=trial)
            assert d <= 1e-9, f"trial {trial}: overlap but d={d}"
            # SAT depth vs sampled ground truth (sampling is itself a
            # lower bound of the gap, i.e. an over-estimate of depth)
            assert abs(d - depth) < 5e-3, \
                f"trial {trial}: depth {d} vs sampled {depth}"
        else:
            n_sep += 1
            dref, _, _ = _fw_reference_distance(A, B)
            assert d <= dref + 1e-9  # GJK at least as tight as FW
            assert abs(d - dref) < 5e-4
    assert n_sep >= 1 and n_pen >= 1  # both regimes exercised


def test_envelope_gradient_matches_fd():
    rng = np.random.default_rng(1)
    A, Na, Ea = hull_of(rng.normal(size=(30, 3)))
    B0, Nb, Eb = hull_of(rng.normal(size=(30, 3)))
    cx, _ = edge_cross_axes(jnp.asarray(Ea), jnp.ones(len(Ea), bool),
                            jnp.asarray(Eb), jnp.ones(len(Eb), bool))
    axes = jnp.asarray(np.concatenate([Na, Nb, np.asarray(cx)]))
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


def test_envelope_gradient_matches_fd_penetrating():
    """Gradients of the SAT (penetration) branch: the gather-based
    envelope recompute must match FD for both translation and rotation
    of one hull at a generic penetrating configuration."""
    rng = np.random.default_rng(3)
    A, Na, Ea = hull_of(rng.normal(size=(30, 3)))
    B0, Nb, Eb = hull_of(rng.normal(size=(30, 3)))

    def f(t, w):
        # small rotation via Rodrigues about w
        th = jnp.sqrt(w @ w + 1e-24)
        k = w / th
        K = jnp.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                       [-k[1], k[0], 0]])
        R = jnp.eye(3) + jnp.sin(th) * K + (1 - jnp.cos(th)) * (K @ K)
        Bw = jnp.asarray(B0) @ R.T + t
        naw = jnp.asarray(Nb) @ R.T
        cx, cxv = edge_cross_axes(
            jnp.asarray(Ea), jnp.ones(len(Ea), bool),
            jnp.asarray(Eb) @ R.T, jnp.ones(len(Eb), bool))
        axes = jnp.concatenate([jnp.asarray(Na), naw, cx])
        valid = jnp.concatenate(
            [jnp.ones(len(Na) + len(Nb), bool), cxv])
        return convex_convex(jnp.asarray(A), 0.0, Bw, 0.0, axes, valid)

    t0 = jnp.asarray([0.61, 0.13, -0.22])   # overlapping placement
    w0 = jnp.asarray([0.2, -0.1, 0.31])
    d0 = float(f(t0, w0))
    assert d0 < 0.0, "configuration must be penetrating"
    gt, gw = jax.grad(f, argnums=(0, 1))(t0, w0)
    eps = 1e-6
    for i in range(3):
        e = eps * jnp.eye(3)[i]
        fd_t = (float(f(t0 + e, w0)) - float(f(t0 - e, w0))) / (2 * eps)
        fd_w = (float(f(t0, w0 + e)) - float(f(t0, w0 - e))) / (2 * eps)
        np.testing.assert_allclose(float(gt[i]), fd_t, atol=2e-4)
        np.testing.assert_allclose(float(gw[i]), fd_w, atol=2e-4)


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


def test_max_cross_edges_cap_bounds_axis_count():
    """The scene-level cross-edge cap (CollisionScene.max_cross_edges)
    truncates the RANKED edge set: separation results are unchanged (the
    GJK certificate + witness axis never depend on edge crosses), and
    the stacked edge arrays shrink to the cap.  Regression for the
    round-4 152 GB SAT-projection OOM on the verbatim PR2 mesh scene."""
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(60, 3))
    scene = CollisionScene(boxbot())
    scene.max_cross_edges = 4
    scene.add_link_convex("boxbot_link", pts)
    scene.add_world_convex("whull", pts * 0.8 + np.array([3.0, 0.2, 0.1]))
    (key, idxs, a, b), = [g for g in scene._pair_groups()
                          if g[0] == ("convex", "convex")]
    assert a["edges"].shape[1] <= 4 and b["edges"].shape[1] <= 4
    d_capped = float(scene.distances(jnp.asarray([0.0, 0.0]))[0])
    # uncapped scene agrees on the separated distance
    scene2 = CollisionScene(boxbot())
    scene2.add_link_convex("boxbot_link", pts)
    scene2.add_world_convex("whull", pts * 0.8 + np.array([3.0, 0.2, 0.1]))
    d_full = float(scene2.distances(jnp.asarray([0.0, 0.0]))[0])
    np.testing.assert_allclose(d_capped, d_full, atol=1e-9)


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
        assert np.all(((d1 < 0) == (d2 < 0)) | m)


def test_mesh_hull_import_distance_sanity():
    """URDF mesh -> hull import (scene_from_urdf mesh_mode='hull') is
    covered by tests/test_mesh_urdf.py against the reference URDFs;
    here: hull_of returns a closed vertex/normal set for a box mesh."""
    from trajopt_tpu.collision import decompose as dc

    m = dc.box_mesh([0.2, 0.3, 0.4])
    hv, normals, edges = hull_of(m.vertices)
    assert hv.shape[0] == 8
    assert 3 <= normals.shape[0] <= 6
    # 3 axis dirs + up to 6 triangulation face diagonals
    assert 3 <= edges.shape[0] <= 9
    d = _kernel(hv, 0.0, _box_verts([0.1] * 3, [2.0, 0, 0]), 0.0,
                normals, BOX_NORMALS)
    np.testing.assert_allclose(d, 2.0 - 0.2 - 0.1, atol=1e-6)


def _fw_reference_distance(A, B, iters=20000):
    """Independent long-run Frank-Wolfe solve of the support QP
    min |x - y|, x in conv(A), y in conv(B) (no shared code with the
    kernel's GJK)."""
    wa = np.ones(len(A)) / len(A)
    wb = np.ones(len(B)) / len(B)
    for _ in range(iters):
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
    return float(np.linalg.norm(wa @ A - wb @ B)), wa, wb


def test_grazing_battery_no_false_penetration():
    """Round-3 VERDICT regression: random near-touching hull pairs with
    true distance in [2e-4, 1e-3] by construction (start from an
    LP-verified separated pair, then translate B along the converged
    witness direction, which changes the true distance by exactly the
    translation; re-verify separation by LP) must report
    |error| < 1e-3.  The old SAT-certificate branch could report large
    false penetrations for separated pairs whose witness plane is
    neither a face normal nor an edge cross."""
    rng = np.random.default_rng(11)
    n_checked = 0
    for trial in range(10):
        A, Na, Ea = hull_of(rng.normal(size=(40, 3)))
        B, Nb, Eb = hull_of(rng.normal(size=(40, 3))
                            + np.array([5.0, 0.5, 0.0]))
        if _hulls_overlap_lp(A, B):
            continue
        d0, wa, wb = _fw_reference_distance(A, B, iters=40000)
        if d0 < 0.05:  # want a well-converged witness direction
            continue
        gap = rng.uniform(2e-4, 1e-3)
        u = (wa @ A - wb @ B) / d0
        B = B + (d0 - gap) * u
        if _hulls_overlap_lp(A, B):  # construction failed; skip
            continue
        d = _kernel(A, 0.0, B, 0.0, Na, Nb, Ea, Eb)
        n_checked += 1
        assert abs(d - gap) < 1e-3, \
            f"trial {trial}: kernel {d} vs constructed gap {gap}"
        assert d > 0.0, f"trial {trial}: false penetration {d}"
    assert n_checked >= 5


def test_grazing_battery_f32():
    """The same near-touching construction through the f32 TPU path:
    errors bounded by ~the f32 certificate window, never a large false
    penetration."""
    rng = np.random.default_rng(12)
    n_checked = 0
    for trial in range(8):
        A, Na, Ea = hull_of(rng.normal(size=(40, 3)))
        B, Nb, Eb = hull_of(rng.normal(size=(40, 3))
                            + np.array([5.0, 0.5, 0.0]))
        if _hulls_overlap_lp(A, B):
            continue
        d0, wa, wb = _fw_reference_distance(A, B, iters=40000)
        if d0 < 0.05:
            continue
        gap = rng.uniform(2e-4, 1e-3)
        u = (wa @ A - wb @ B) / d0
        B = B + (d0 - gap) * u
        if _hulls_overlap_lp(A, B):
            continue
        d = _kernel(A, 0.0, B, 0.0, Na, Nb, Ea, Eb, dtype=jnp.float32)
        n_checked += 1
        assert abs(d - gap) < 2e-3, \
            f"trial {trial}: kernel {d} vs constructed gap {gap}"
    assert n_checked >= 4


def test_gjk_certificate_residual_at_penetration():
    """The separation certificate threshold (1e-4 * scale f32 / 1e-11 *
    scale f64, convex.py convex_convex) must upper-bound the
    best-iterate GJK residual on truly penetrating pairs, in BOTH dtypes
    (the f32 TPU path and the f64 CPU path)."""
    from trajopt_tpu.collision.convex import _gjk_weights

    rng = np.random.default_rng(7)
    for dtype, eps in ((jnp.float32, 1e-4), (jnp.float64, 1e-11)):
        for _ in range(10):
            # overlapping clouds -> hull interiors intersect
            A, _, _ = hull_of(rng.normal(size=(30, 3)))
            B, _, _ = hull_of(rng.normal(size=(30, 3))
                              + rng.uniform(-0.3, 0.3, size=3))
            Aj = jnp.asarray(A, dtype)
            Bj = jnp.asarray(B, dtype)
            wa, wb = _gjk_weights(Aj, Bj)
            resid = float(jnp.linalg.norm(wa @ Aj - wb @ Bj))
            scale = 1.0 + float(jnp.max(jnp.abs(Aj))) \
                + float(jnp.max(jnp.abs(Bj)))
            assert resid <= eps * scale


def test_seed3_pair_true_overlap_regression():
    """The exact seed-3 pair the round-3 VERDICT flagged: it GENUINELY
    overlaps (LP certificate) with penetration depth ~0.7397 (200k-dir
    sampling + refinement); the kernel must report that depth, and GJK
    must certify contact (best-iterate distance ~0)."""
    from trajopt_tpu.collision.convex import _gjk_weights

    rng = np.random.default_rng(3)
    A, Na, Ea = hull_of(rng.normal(size=(40, 3)))
    B, Nb, Eb = hull_of(rng.normal(size=(40, 3)) + np.array([4.0, 0.5, 0]))
    assert _hulls_overlap_lp(A, B)
    wa, wb = _gjk_weights(jnp.asarray(A), jnp.asarray(B))
    assert float(np.linalg.norm(np.asarray(wa) @ A
                                - np.asarray(wb) @ B)) < 1e-11
    d = _kernel(A, 0.0, B, 0.0, Na, Nb, Ea, Eb)
    np.testing.assert_allclose(d, -0.7397, atol=2e-3)
