"""Independent cross-check of the collision verifier (VERDICT r4 item 5).

The bench's swept verification reuses the solver's narrowphase kernels
(finer LVS granularity only) — the same property the reference has
(checkTrajectory also queries tesseract, cast_cost_unit.cpp:84-118).  A
kernel-level blind spot would pass both solve and verify.  This script
re-verifies solved trajectories with an INDEPENDENT implementation:

* FK: a from-scratch numpy matrix chain over the URDF joints (no shared
  code with kinematics/chain.py beyond the robot spec itself).
* narrowphase: support-function separation certificates over a fixed
  direction set (any direction u with min_b u.b - max_a u.a - ra - rb > 0
  PROVES separation — no GJK/SAT code shared); pairs that no sampled
  direction certifies are escalated to an exact scipy SLSQP minimum-
  distance solve over the two hulls' convex weights.
* sweep: dense discrete sampling of each gap (sub-step displacement
  <= 0.025, half the solver's LVS-0.05 verify granularity).

Reports, per lane: the certified minimum clearance (a LOWER bound of the
true clearance at every sampled configuration) and the agreement bound
vs the solver's swept_distances on identical configurations.  Usage:

  python benchmarks/external_verify.py [n_lanes]   # default 100
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# ---------------------------------------------------------- numpy FK

def _rpy(rpy):
    r, p, y = float(rpy[0]), float(rpy[1]), float(rpy[2])

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    return rz(y) @ ry(p) @ rx(r)


def _axis_angle(axis, th):
    """Rodrigues, batched over th [N]."""
    k = np.asarray(axis, float)
    k = k / np.linalg.norm(k)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    c = np.cos(th)[:, None, None]
    s = np.sin(th)[:, None, None]
    return c * np.eye(3) + s * K + (1 - c) * np.outer(k, k)


def numpy_fk(tree, Q):
    """World link poses for configs Q [N, n_dof] -> (R [N,L,3,3], p [N,L,3]).

    Independent implementation: a plain matrix chain in numpy."""
    N = Q.shape[0]
    L = tree.n_links
    R = np.zeros((N, L, 3, 3))
    p = np.zeros((N, L, 3))
    R[:, 0] = np.eye(3)
    from trajopt_tpu.kinematics import urdf as urdf_mod
    for k, j in enumerate(tree.joints):
        par, chd = tree.parent_link[k], tree.child_link[k]
        Rp, pp = R[:, par], p[:, par]
        Ro = _rpy(j.origin_rpy)
        po = np.asarray(j.origin_xyz, float)
        Rj = Rp @ Ro
        pj = Rp @ po + pp
        qi = tree.q_index[k]
        if qi >= 0 and j.jtype == urdf_mod.REVOLUTE:
            Rj = Rj @ _axis_angle(j.axis, Q[:, qi])
        elif qi >= 0 and j.jtype == urdf_mod.PRISMATIC:
            d = np.asarray(j.axis, float)
            pj = pj + np.einsum("nij,j->ni", Rj, d) * Q[:, qi][:, None]
        R[:, chd] = Rj
        p[:, chd] = pj
    return R, p


# ----------------------------------------------- direction certificates

def _direction_set(k_ico: int = 4):
    """Fixed near-uniform direction set: fibonacci sphere + coord axes."""
    i = np.arange(128)
    phi = np.pi * (3.0 - np.sqrt(5.0)) * i
    z = 1.0 - 2.0 * (i + 0.5) / len(i)
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    dirs = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=1)
    return np.concatenate([dirs, np.eye(3), -np.eye(3)])


def exact_hull_distance(Va, Vb):
    """Exact min distance between conv(Va) and conv(Vb) via SLSQP on the
    convex weights (scipy — an implementation path fully disjoint from
    the repo's GJK/SAT kernels).  Returns 0.0 at overlap."""
    from scipy.optimize import minimize

    na, nb = len(Va), len(Vb)

    def f(w):
        a = w[:na] @ Va
        b = w[na:] @ Vb
        d = a - b
        return d @ d

    def jac(w):
        a = w[:na] @ Va
        b = w[na:] @ Vb
        d = a - b
        return np.concatenate([2 * Va @ d, -2 * Vb @ d])

    w0 = np.concatenate([np.full(na, 1.0 / na), np.full(nb, 1.0 / nb)])
    cons = [{"type": "eq", "fun": lambda w: np.sum(w[:na]) - 1.0,
             "jac": lambda w: np.concatenate([np.ones(na), np.zeros(nb)])},
            {"type": "eq", "fun": lambda w: np.sum(w[na:]) - 1.0,
             "jac": lambda w: np.concatenate([np.zeros(na), np.ones(nb)])}]
    res = minimize(f, w0, jac=jac, bounds=[(0.0, 1.0)] * (na + nb),
                   constraints=cons, method="SLSQP",
                   options={"maxiter": 200, "ftol": 1e-14})
    return float(np.sqrt(max(res.fun, 0.0)))


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    from trajopt_tpu.utils.profiling import machine_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     machine_cache_dir("jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from __graft_entry__ import _solver_params
    from trajopt_tpu.collision.world import _canon_vertex_form
    from trajopt_tpu.models.benchmarks import (pr2ish_table_batch,
                                               pr2ish_table_problem)

    n_lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_steps = 30
    sub_len = 0.025   # half the verify LVS granularity

    prob, scene = pr2ish_table_problem(
        n_steps=n_steps,
        lvs_substeps=int(os.environ.get("BENCH_LVS", "2")))
    tree = scene.tree
    solve = prob.make_solve(_solver_params(), structured=True)
    fn = jax.jit(jax.vmap(lambda i, g: solve(i, {"goal": g})))
    # easy + hard mix, like the VERDICT asks
    inits, goals = pr2ish_table_batch(jax.random.PRNGKey(11), n_lanes,
                                      n_steps, hard_frac=0.3)
    t0 = time.time()
    res = fn(inits, goals)
    jax.block_until_ready(res)
    status = np.asarray(res.status)
    print(f"# solved {int((status == 1).sum())}/{n_lanes} lanes in "
          f"{time.time() - t0:.1f}s (incl compile)", file=sys.stderr)
    traj = np.asarray(res.x, float).reshape(n_lanes, n_steps, tree.n_dof)
    conv_lanes = np.nonzero(status == 1)[0]
    traj = traj[conv_lanes]

    # dense discrete sampling of every gap
    disp = np.linalg.norm(np.diff(traj, axis=1), axis=2).max()
    n_sub = max(2, int(np.ceil(disp / sub_len)))
    fr = np.linspace(0.0, 1.0, n_sub + 1)
    q0 = traj[:, :-1][:, :, None, :]                       # [B,T-1,1,D]
    q1 = traj[:, 1:][:, :, None, :]
    Q = q0 + fr[None, None, :, None] * (q1 - q0)           # [B,T-1,S+1,D]
    B = Q.shape[0]
    Q = Q.reshape(-1, tree.n_dof)
    print(f"# {B} lanes x {n_steps - 1} gaps x {n_sub + 1} samples = "
          f"{Q.shape[0]} configs", file=sys.stderr)

    t0 = time.time()
    R, p = numpy_fk(tree, Q)
    print(f"# numpy FK: {time.time() - t0:.1f}s", file=sys.stderr)

    dirs = _direction_set()                                # [K,3]
    pairs = scene.pairs()
    pair_min = np.full((len(pairs), Q.shape[0]), np.inf)
    n_escal = 0
    escal_max_pen = 0.0
    t0 = time.time()
    for pi, (ga, gb) in enumerate(pairs):
        va, _, _, ra = _canon_vertex_form(ga)
        vb, _, _, rb = _canon_vertex_form(gb)

        def world(g, v):
            if g.link is None:
                if g.kind in ("sphere", "capsule", "box"):
                    return np.broadcast_to(v, (Q.shape[0],) + v.shape)
                # convex world geom: verts already world-frame via R_local
                Rw = np.asarray(g.R_local, float)
                pw = np.asarray(g.p_local, float)
                return np.broadcast_to(v @ Rw.T + pw,
                                       (Q.shape[0],) + v.shape)
            lid = tree.link_id(g.link)
            return np.einsum("nij,vj->nvi", R[:, lid], v) + p[:, lid][:, None]

        Wa = world(ga, va)                                  # [N,Va,3]
        Wb = world(gb, vb)
        pa = np.einsum("nvi,ki->nvk", Wa, dirs)             # [N,Va,K]
        pb = np.einsum("nvi,ki->nvk", Wb, dirs)
        gap = np.maximum(pb.min(1) - pa.max(1),
                         pa.min(1) - pb.max(1)) - ra - rb   # [N,K]
        cert = gap.max(1)                                   # certified lower bd
        pair_min[pi] = cert
        # escalate UNcertified configs (cert <= 0) to the exact solver
        bad = np.nonzero(cert <= 0.0)[0]
        for ni in bad[:200]:
            d = exact_hull_distance(Wa[ni], Wb[ni]) - ra - rb
            pair_min[pi, ni] = d
            n_escal += 1
            if d < 0:
                escal_max_pen = max(escal_max_pen, -d)
        if len(bad) > 200:
            print(f"# pair {pi} ({ga.name},{gb.name}): {len(bad)} "
                  f"uncertified configs, escalated first 200",
                  file=sys.stderr)
    print(f"# certificates: {time.time() - t0:.1f}s, {n_escal} exact "
          f"escalations"
          + (f", max exact penetration {escal_max_pen:.5f}"
             if escal_max_pen > 0 else ""), file=sys.stderr)

    lane_min = pair_min.min(axis=0).reshape(B, -1).min(axis=1)
    n_free = int((lane_min > 0.0).sum())
    print(f"# EXTERNAL verdict: {n_free}/{B} converged lanes collision-"
          f"free at every sampled config; worst lane clearance "
          f"{lane_min.min():+.5f}", file=sys.stderr)

    # agreement bound vs the repo's swept kernel on identical gap queries:
    # the union-hull cast under-estimates distance (conservative), so
    # repo_swept <= sampled_discrete_min must hold up to kernel tolerance.
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    repo_mins = bench._swept_verify(scene, jnp.asarray(traj, jnp.float32),
                                    tree.n_dof, check_len=0.05)
    repo_mins = np.asarray(repo_mins, float)
    diff = repo_mins - lane_min           # <= 0 up to tolerance
    agree_free = int(((repo_mins > 0) == (lane_min > 0)).sum())
    print(f"# agreement: {agree_free}/{B} lanes same free/colliding "
          f"verdict; repo_swept - external_min in "
          f"[{diff.min():+.5f}, {diff.max():+.5f}] "
          f"(positive max would mean the repo verifier OVER-estimates "
          f"clearance beyond sampling slack)", file=sys.stderr)
    import json
    print(json.dumps({
        "lanes": int(B), "external_free": n_free,
        "agree": agree_free, "escalations": n_escal,
        "worst_clearance": round(float(lane_min.min()), 5),
        "diff_min": round(float(diff.min()), 5),
        "diff_max": round(float(diff.max()), 5),
    }))


if __name__ == "__main__":
    main()
