"""Convex-polytope (mesh hull) narrowphase: sphere-swept vertex sets.

The reference's collision model for mesh geometry is the CONVEX HULL of
each collision mesh (tesseract converts URDF meshes to convex shapes for
its contact managers; trajopt's own paper formulates signed distance
between convex shapes).  This module provides the TPU-native kernel for
that model: every shape is a padded vertex set + sweep radius
(sphere-swept polytope) — a hull is its vertices with radius 0, a sphere
is 1 vertex + r, a capsule 2 vertices + r, a box its 8 corners — and ONE
kernel covers every pairing:

* separated: GJK on the Minkowski-difference support problem (each
  iteration is two [V,3] matvecs + an argmax — MXU/VPU friendly, fixed
  iteration count, jit/vmap-clean).  The returned distance uses the
  envelope form ``|wa@Va - wb@Vb|`` with the weights computed under
  stop_gradient, so pose gradients are the exact witness-point gradients
  without backprop through the iterations.
* penetrating: separating-axis (SAT) depth over both hulls' face
  normals, the centroid axis, and edge-direction cross products — the
  EPA role with static shapes.  The FULL edge-cross set would make the
  candidate set complete for polytope pairs (separating-axis theorem);
  in practice the per-hull edge-direction set is capped
  (``max_cross_edges``, collision/world.py) so the depth at edge-edge
  contacts of complex hulls is CONSERVATIVE (an upper bound on
  penetration depth — never under-reports), exact for face contacts and
  for hulls within the cap.  world.py documents the cap trade-off.

The branch test is GJK's OWN certificate, not SAT's: ``d_gjk > eps``
proves separation (GJK converges finitely and exactly on polytopes) —
SAT's "no candidate axis separates" is NOT proof of penetration when the
axis set is incomplete (vertex-vertex / edge-edge proximities of
separated hulls have no separating face normal; trusting SAT there
mis-reported true distance ~+2e-4 as -0.74 penetration, round-3
VERDICT).  Only when GJK drives the simplex onto the origin
(``d_gjk <= eps``) is the SAT depth used.  Matches the signed-distance
correctness the reference's gradient extraction assumes
(/root/reference/trajopt/src/collision_terms.cpp:203-323).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# GJK support steps: finite convergence on polytopes (~10 at reference
# hull sizes; 16 passed every accuracy battery in tests/test_convex.py).
# The old Frank-Wolfe kernel needed 64; GJK replaced it in round 3.
GJK_ITERS = 16


# The 15 non-empty subsets of a 4-point simplex, as masks [15, 4].
_SUBSETS = np.array([[int(b) for b in f"{m:04b}"] for m in range(1, 16)],
                    np.float64)


def _chol4_solve(G: jax.Array, b: jax.Array) -> jax.Array:
    """Closed-form Cholesky solve of SPD 4x4 systems, batched over
    leading dims — pure arithmetic, no LAPACK custom call (jnp.linalg
    .solve inside the GJK loop OOMed LLVM on CPU at PR2-fixture scale
    and is latency-bound on TPU).  Degenerate pivots are floored; their
    garbage solutions are filtered by the caller's feasibility check."""
    tiny = jnp.asarray(1e-30, G.dtype)

    def g(i, j):
        return G[..., i, j]

    l11 = jnp.sqrt(jnp.maximum(g(0, 0), tiny))
    l21 = g(1, 0) / l11
    l31 = g(2, 0) / l11
    l41 = g(3, 0) / l11
    l22 = jnp.sqrt(jnp.maximum(g(1, 1) - l21 * l21, tiny))
    l32 = (g(2, 1) - l31 * l21) / l22
    l42 = (g(3, 1) - l41 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(g(2, 2) - l31 * l31 - l32 * l32, tiny))
    l43 = (g(3, 2) - l41 * l31 - l42 * l32) / l33
    l44 = jnp.sqrt(jnp.maximum(
        g(3, 3) - l41 * l41 - l42 * l42 - l43 * l43, tiny))
    y1 = b[..., 0] / l11
    y2 = (b[..., 1] - l21 * y1) / l22
    y3 = (b[..., 2] - l31 * y1 - l32 * y2) / l33
    y4 = (b[..., 3] - l41 * y1 - l42 * y2 - l43 * y3) / l44
    x4 = y4 / l44
    x3 = (y3 - l43 * x4) / l33
    x2 = (y2 - l32 * x3 - l42 * x4) / l22
    x1 = (y1 - l21 * x2 - l31 * x3 - l41 * x4) / l11
    return jnp.stack([x1, x2, x3, x4], axis=-1)


def _closest_on_simplex(W: jax.Array):
    """Barycentric weights of the closest point to the origin on the
    convex hull of the 4 points W [4,3] (the GJK distance subproblem),
    solved by enumerating all 15 vertex subsets: each subset's affine
    minimizer is lam = G^-1 1 / (1' G^-1 1) with G the subset Gram matrix;
    the true projection is the feasible (lam >= 0) subset minimizer with
    the smallest norm.  Branch-free and fixed-shape."""
    dtype = W.dtype
    G = W @ W.T                                            # [4, 4]
    sub = jnp.asarray(_SUBSETS, dtype)                     # [15, 4]
    # Padded per-subset systems: identity rows/cols off-subset.
    m2 = sub[:, :, None] * sub[:, None, :]                 # [15, 4, 4]
    eye = jnp.eye(4, dtype=dtype)
    Gs = G[None] * m2 + eye[None] * (1.0 - m2)
    # Tiny ridge keeps degenerate subsets solvable; their lam goes
    # infeasible or non-minimal and drops out.
    Gs = Gs + 1e-12 * eye[None]
    rhs = sub                                              # [15, 4]
    lam = _chol4_solve(Gs, rhs)                            # [15, 4]
    lam = lam * sub
    denom = jnp.sum(lam, axis=1, keepdims=True)
    lam = lam / jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
    pts = lam @ W                                          # [15, 3]
    n2 = jnp.sum(pts * pts, axis=1)
    feasible = jnp.all(lam >= -1e-9, axis=1) & \
        (jnp.abs(denom[:, 0]) > 1e-30) & jnp.all(jnp.isfinite(lam), axis=1)
    n2 = jnp.where(feasible, n2, jnp.inf)
    best = jnp.argmin(n2)
    return jnp.clip(lam[best], 0.0, 1.0)


def _gjk_weights(A: jax.Array, B: jax.Array, iters: int = 16):
    """GJK witness weights for min |x - y|, x in conv(A), y in conv(B):
    a 4-slot simplex on the Minkowski difference, support steps, and the
    subset-enumeration distance subproblem.  Finite convergence on
    polytopes (~10 support steps at reference-mesh hull sizes).  Runs on
    stop-gradient copies; returns (wa [nA], wb [nB]) so the caller forms
    the envelope distance |wa@A - wb@B| with gradients flowing only
    through the final weighted sums (exact witness gradients at the
    optimum)."""
    A = jax.lax.stop_gradient(A)
    B = jax.lax.stop_gradient(B)
    nA, nB = A.shape[0], B.shape[0]
    dtype = A.dtype

    # init simplex: all 4 slots at the first Minkowski vertex
    ia0 = jnp.zeros((4,), jnp.int32)
    ib0 = jnp.zeros((4,), jnp.int32)
    lam0 = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype)

    def merge_duplicates(idA, idB, lam):
        # Duplicate slots (same Minkowski vertex twice) split the
        # optimum's weight across copies, which can make argmin(lam)
        # evict a genuinely-needed support point and send the loop into
        # a 2-cycle.  Consolidating each duplicate's weight into its
        # first copy guarantees a zero-weight slot whenever the optimum
        # has <= 3 support points (always true while d > 0), restoring
        # GJK's monotone-progress invariant.
        for i in range(4):
            for j in range(i + 1, 4):
                dup = (idA[i] == idA[j]) & (idB[i] == idB[j])
                lam = lam.at[i].add(jnp.where(dup, lam[j], 0.0))
                lam = lam.at[j].set(jnp.where(dup, 0.0, lam[j]))
        return lam

    def body(_, carry):
        idA, idB, lam, best = carry
        bd2, bidA, bidB, blam = best
        W = A[idA] - B[idB]                                # [4, 3]
        z = lam @ W
        # int32: the simplex index slots are int32 and x64 mode would
        # otherwise produce int64 argmin/argmax (unsafe-scatter error in
        # future JAX releases)
        sa = jnp.argmin(A @ z).astype(jnp.int32)
        sb = jnp.argmax(B @ z).astype(jnp.int32)
        # replace the least-contributing slot with the new support point
        slot = jnp.argmin(merge_duplicates(idA, idB, lam))
        idA = idA.at[slot].set(sa)
        idB = idB.at[slot].set(sb)
        W = A[idA] - B[idB]
        lam = _closest_on_simplex(W)
        # Track the BEST iterate, not the last: once the simplex encloses
        # the origin (penetration) the support direction degenerates and
        # the next slot replacement can break the enclosing simplex, so
        # the final iterate may bounce back to a positive |z|.  The best
        # iterate is monotone and is what the separation certificate and
        # the envelope gradient must use.
        z2 = lam @ W
        d2 = z2 @ z2
        take = d2 < bd2
        best = (jnp.where(take, d2, bd2),
                jnp.where(take, idA, bidA),
                jnp.where(take, idB, bidB),
                jnp.where(take, lam, blam))
        return idA, idB, lam, best

    W0 = A[ia0] - B[ib0]
    z0 = lam0 @ W0
    best0 = (z0 @ z0, ia0, ib0, lam0)
    *_, (_, idA, idB, lam) = jax.lax.fori_loop(
        0, iters, body, (ia0, ib0, lam0, best0))
    wa = jnp.zeros((nA,), dtype).at[idA].add(lam)
    wb = jnp.zeros((nB,), dtype).at[idB].add(lam)
    return wa, wb


_fw_weights = _gjk_weights  # kernel entry point (name kept for callers)


def _sat_depth(Va, Vb, axes, valid):
    """Best separating gap over candidate axes: max_k gap_k with
    gap_k = max(min_b - max_a, min_a - max_b) along axis k.  Positive =
    certified separation (a lower bound of true distance), negative =
    no candidate axis separates (depth upper... = penetration estimate).
    ``valid`` masks padded axis rows.

    Envelope-form gradients: the argmax axis k* and the witness vertices
    are found under ``stop_gradient`` (the [A,K]/[B,K] projection matmuls
    never enter the backward pass — they dominated reverse-mode cost at
    flagship scale), then the winning gap is RECOMPUTED from the three
    gathered vectors ``axes[k*]``, ``Va[ia*]``, ``Vb[ib*]`` so gradients
    flow only through that O(1) expression.  Exact subgradient at the
    optimum (envelope theorem over the finite axis/vertex max)."""
    Va_s = jax.lax.stop_gradient(Va)
    Vb_s = jax.lax.stop_gradient(Vb)
    axes_s = jax.lax.stop_gradient(axes)
    pa = Va_s @ axes_s.T                               # [A, K]
    pb = Vb_s @ axes_s.T
    nrm_s = jnp.sqrt(jnp.sum(axes_s * axes_s, axis=1)
                     + jnp.asarray(1e-24, axes_s.dtype))
    gap_ba = (pb.min(axis=0) - pa.max(axis=0)) / nrm_s  # [K]
    gap_ab = (pa.min(axis=0) - pb.max(axis=0)) / nrm_s
    gap = jnp.maximum(gap_ba, gap_ab)
    gap = jnp.where(valid & (nrm_s > 1e-9), gap, -jnp.inf)
    k = jnp.argmax(gap)
    # winner selection as one-hot contractions, not dynamic gathers
    # (per-pair gathers under the flagship vmap lower to slow TPU
    # scatter/gather sequences; one-hot matvecs stay on the VPU)
    oh_k = (jnp.arange(gap.shape[0]) == k).astype(axes.dtype)   # [K]
    flip = (gap_ab @ oh_k) > (gap_ba @ oh_k)           # a-above-b side won
    pa_k = pa @ oh_k                                   # [A]
    pb_k = pb @ oh_k
    ia = jnp.where(flip, jnp.argmin(pa_k), jnp.argmax(pa_k))
    ib = jnp.where(flip, jnp.argmax(pb_k), jnp.argmin(pb_k))
    oh_a = (jnp.arange(pa_k.shape[0]) == ia).astype(axes.dtype)
    oh_b = (jnp.arange(pb_k.shape[0]) == ib).astype(axes.dtype)
    # differentiable recompute from the selected winners only
    u = oh_k @ axes
    nrm = jnp.sqrt(u @ u + jnp.asarray(1e-24, u.dtype))
    s = jnp.where(flip, -1.0, 1.0).astype(u.dtype)
    return s * (u @ (oh_b @ Vb - oh_a @ Va)) / nrm


def edge_cross_axes(ea, ea_valid, eb, eb_valid):
    """SAT candidate axes from two edge-direction sets: all pairwise
    cross products cross(ea_i, eb_j) flattened to [Ea*Eb, 3] with the
    outer validity mask.  Near-parallel pairs give near-zero axes, which
    :func:`_sat_depth` masks by norm.  Together with both hulls' face
    normals these complete the separating-axis candidate set for
    polytope pairs."""
    c = jnp.cross(ea[:, None, :], eb[None, :, :]).reshape(-1, 3)
    v = (ea_valid[:, None] & eb_valid[None, :]).reshape(-1)
    return c, v


def convex_convex(Va, ra, Vb, rb, axes, axes_valid,
                  iters: int = GJK_ITERS):
    """Signed distance between two sphere-swept posed vertex sets.

    Va [A,3], Vb [B,3]: world-frame vertices; ra, rb: sweep radii;
    axes [K,3]: world-frame candidate separating axes (both hulls' face
    normals + edge-direction cross products, see
    :func:`edge_cross_axes`), axes_valid [K] masking padding rows;
    ``iters``: GJK support-step count (finite convergence on polytopes,
    ~10 steps at reference hull sizes).
    """
    wa, wb = _gjk_weights(Va, Vb, iters=iters)
    z = wa @ Va - wb @ Vb
    # safe norm: at penetration GJK converges to z = 0 and norm's gradient
    # is 0/0 = NaN, which would poison the selected SAT branch through
    # jnp.where's vjp; the epsilon keeps the gradient bounded (|g| <= 1).
    d_gjk = jnp.sqrt(z @ z + jnp.asarray(1e-24, z.dtype))
    # Two extra candidate axes join the caller's faces/edge-crosses:
    # * the centroid-difference axis closes the no-normal hole
    #   (sphere/capsule sides contribute no faces — for penetrating
    #   spheres it is exactly the right axis) and tightens corner
    #   contacts;
    # * the GJK witness direction: at a separated optimum its support
    #   gap IS the true distance, so SAT certifies separation even for
    #   vertex-vertex / vertex-edge proximities whose witness plane is
    #   neither a face normal nor an edge cross (and even when the
    #   per-hull edge list was decimated).  At penetration z ~ 0 and the
    #   (noise) direction only contributes a very negative gap, which
    #   max() ignores.
    cax = jnp.mean(Va, axis=0) - jnp.mean(Vb, axis=0)
    wax = jax.lax.stop_gradient(z)
    axes = jnp.concatenate([axes, cax[None, :], wax[None, :]], axis=0)
    axes_valid = jnp.concatenate(
        [axes_valid, jnp.ones((2,), bool)], axis=0)
    d_sat = _sat_depth(Va, Vb, axes, axes_valid)
    # Separation is decided by GJK's certificate (a positive converged
    # witness distance) OR SAT's (a certified separating axis) — either
    # alone proves it.  The certificate threshold scales with the scene:
    # at true penetration the best GJK iterate sits on the origin up to
    # round-off of the 4x4 simplex solve (measured worst over randomized
    # penetrating-hull batteries: 4.7e-6*scale in f32, 6.8e-14*scale in
    # f64 — tests/test_convex.py::
    # test_gjk_certificate_residual_at_penetration).  A gap below eps
    # falls to the SAT branch, which with the edge-cross axes is exact
    # for polytope pairs, so the misclassification window costs nothing
    # on discrete pairs and at most ~eps on swept unions.
    scale = jax.lax.stop_gradient(
        1.0 + jnp.max(jnp.abs(Va)) + jnp.max(jnp.abs(Vb)))
    eps = (1e-4 if z.dtype == jnp.float32 else 1e-11) * scale
    separated = (d_gjk > eps) | (d_sat >= 0.0)
    d = jnp.where(separated, d_gjk, d_sat)
    return d - ra - rb


def hull_of(vertices: np.ndarray, max_vertices: int | None = None,
            max_edges: int = 24):
    """(hull vertices [V,3], deduplicated outward face normals [F,3],
    deduplicated edge directions [E,3]) of a point cloud.

    Edge directions (unit, deduplicated up to sign, at most ``max_edges``
    ranked by total parallel-class edge length) feed the SAT edge-cross
    candidate axes that make the penetration branch exact for polytope
    pairs.  ``max_vertices`` optionally decimates by greedy
    farthest-point selection (slight under-approximation)."""
    from trajopt_tpu.collision.decompose import _hull_points

    pts = np.asarray(vertices, float)
    normals = np.zeros((0, 3))
    edges = np.zeros((0, 3))
    hv = pts
    try:
        from scipy.spatial import ConvexHull

        # exact hull first — QJ joggles the input by ~1e-3 and biases the
        # SAT face normals; fall back to QJ only on degenerate inputs
        try:
            hull = ConvexHull(pts)
        except Exception:
            hull = ConvexHull(pts, qhull_options="QJ")
        hv = pts[hull.vertices]
        eq = hull.equations[:, :3]
        eq = eq / np.maximum(np.linalg.norm(eq, axis=1, keepdims=True),
                             1e-30)
        uniq: list = []
        for n in eq:
            if not any(abs(float(n @ u)) > 0.99999 for u in uniq):
                uniq.append(n)
        normals = np.asarray(uniq)
        edges = _edge_directions(pts, hull.simplices, max_edges)
    except Exception:
        from trajopt_tpu.collision.decompose import _hull_points

        hv = _hull_points(pts)
    if max_vertices is not None and hv.shape[0] > max_vertices:
        sel = [int(np.argmax(np.linalg.norm(hv - hv.mean(0), axis=1)))]
        d = np.linalg.norm(hv - hv[sel[0]], axis=1)
        for _ in range(max_vertices - 1):
            i = int(np.argmax(d))
            sel.append(i)
            d = np.minimum(d, np.linalg.norm(hv - hv[i], axis=1))
        hv = hv[np.asarray(sel)]
    return hv, normals, edges


def _edge_directions(pts: np.ndarray, simplices: np.ndarray,
                     max_edges: int) -> np.ndarray:
    """Unique unit edge directions of a hull triangulation, deduplicated
    up to sign and ranked by the total length of each parallel class
    (long edges dominate realistic edge-edge contact configurations)."""
    pairs = set()
    for tri in simplices:
        t = [int(i) for i in tri]
        for i, j in ((0, 1), (1, 2), (0, 2)):
            pairs.add((min(t[i], t[j]), max(t[i], t[j])))
    dirs: list = []       # representative unit directions
    weight: list = []     # accumulated parallel-class edge length
    for i, j in pairs:
        v = pts[j] - pts[i]
        n = float(np.linalg.norm(v))
        if n < 1e-12:
            continue
        u = v / n
        for k, d in enumerate(dirs):
            if abs(float(u @ d)) > 0.99999:
                weight[k] += n
                break
        else:
            dirs.append(u)
            weight.append(n)
    if not dirs:
        return np.zeros((0, 3))
    order = np.argsort(weight)[::-1][:max_edges]
    return np.asarray(dirs)[order]
