"""Probe: are the narrowphase kernels layout-bound on TPU?

Hypothesis: geometry kernels written over [..., 3] vectors waste ~42x of
the VPU (minor dim 3 padded to 128 lanes in every fused elementwise
intermediate).  A scalar-unpacked (structure-of-arrays) form keeps every
intermediate at the batch shape [N] (lanes = batch) instead of [N, 3].

Measures the marginal per-call cost of capsule_box (the flagship's
hottest kernel: 27/91 pairs, ~4 segment_box evals per swept query) in
both forms at flagship-scale N, on whatever backend is default (TPU).

Run: python benchmarks/soa_probe.py
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_default_matmul_precision", "highest")

N = 256 * 29 * 27  # B x gaps x capsule-box pairs
K_LO, K_HI = 2, 8


def _time(fn, *args, reps=3):
    r = fn(*args)
    _ = np.asarray(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _marginal(mk, *args):
    return (_time(mk(K_HI), *args) - _time(mk(K_LO), *args)) / (K_HI - K_LO)


# ---------------- SoA capsule_box ----------------
def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _point_box_sdf_soa(px, py, pz, hx, hy, hz):
    qx, qy, qz = jnp.abs(px) - hx, jnp.abs(py) - hy, jnp.abs(pz) - hz
    ox, oy, oz = jnp.maximum(qx, 0.0), jnp.maximum(qy, 0.0), jnp.maximum(qz, 0.0)
    outside = jnp.sqrt(ox * ox + oy * oy + oz * oz)
    inside = jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0)
    return outside + inside


def capsule_box_soa(a, b, r, R_box, p_box, half, n_coarse=17, n_refine=8):
    """Same math as geometry.capsule_box, scalar-unpacked; inputs are the
    SAME [N,3]/[N,3,3] arrays — unpacked once at entry."""
    dx, dy, dz = (a - p_box)[..., 0], (a - p_box)[..., 1], (a - p_box)[..., 2]
    ex, ey, ez = (b - p_box)[..., 0], (b - p_box)[..., 1], (b - p_box)[..., 2]
    R = R_box
    # local = R^T d
    ax = R[..., 0, 0] * dx + R[..., 1, 0] * dy + R[..., 2, 0] * dz
    ay = R[..., 0, 1] * dx + R[..., 1, 1] * dy + R[..., 2, 1] * dz
    az = R[..., 0, 2] * dx + R[..., 1, 2] * dy + R[..., 2, 2] * dz
    bx = R[..., 0, 0] * ex + R[..., 1, 0] * ey + R[..., 2, 0] * ez
    by = R[..., 0, 1] * ex + R[..., 1, 1] * ey + R[..., 2, 1] * ez
    bz = R[..., 0, 2] * ex + R[..., 1, 2] * ey + R[..., 2, 2] * ez
    hx, hy, hz = half[..., 0], half[..., 1], half[..., 2]

    ux, uy, uz = bx - ax, by - ay, bz - az

    def sdf_t(t):
        return _point_box_sdf_soa(ax + t * ux, ay + t * uy, az + t * uz,
                                  hx, hy, hz)

    ts = jnp.linspace(0.0, 1.0, n_coarse)
    vals = jnp.stack([sdf_t(t) for t in ts])        # [n_coarse, N]
    i = jnp.argmin(vals, axis=0)
    step = 1.0 / (n_coarse - 1)
    ti = ts[i]
    lo = jnp.clip(ti - step, 0.0, 1.0)
    hi = jnp.clip(ti + step, 0.0, 1.0)
    gr = 0.6180339887498949
    for _ in range(n_refine):
        m1 = hi - gr * (hi - lo)
        m2 = lo + gr * (hi - lo)
        f1 = sdf_t(m1)
        f2 = sdf_t(m2)
        lo = jnp.where(f1 < f2, lo, m1)
        hi = jnp.where(f1 < f2, m2, hi)
    t_star = jax.lax.stop_gradient(0.5 * (lo + hi))
    d_sep = sdf_t(t_star)

    # penetration (SAT over 3 face axes + 3 u x e_i axes), scalar form
    pens = []
    for (axv, cx, cy, cz) in (
        ("x", 1.0, 0.0, 0.0), ("y", 0.0, 1.0, 0.0), ("z", 0.0, 0.0, 1.0),
    ):
        r_box = hx * cx + hy * cy + hz * cz
        pa = ax * cx + ay * cy + az * cz
        pb = bx * cx + by * cy + bz * cz
        c = 0.5 * (pa + pb)
        hl = 0.5 * jnp.abs(pa - pb)
        pens.append(r_box + hl - jnp.abs(c))
    # cross axes u x e_i
    crosses = (
        (jnp.zeros_like(ux), uz, -uy),   # u x ex
        (-uz, jnp.zeros_like(ux), ux),   # u x ey
        (uy, -ux, jnp.zeros_like(ux)),   # u x ez
    )
    for i, (cxx, cyy, czz) in enumerate(crosses):
        n = jnp.sqrt(cxx * cxx + cyy * cyy + czz * czz)
        good = n > 1e-9
        inv = jnp.where(good, 1.0 / jnp.where(good, n, 1.0), 0.0)
        nx, ny, nz = cxx * inv, cyy * inv, czz * inv
        r_box = hx * jnp.abs(nx) + hy * jnp.abs(ny) + hz * jnp.abs(nz)
        pa = _dot(nx, ny, nz, ax, ay, az)
        pb = _dot(nx, ny, nz, bx, by, bz)
        c = 0.5 * (pa + pb)
        hl = 0.5 * jnp.abs(pa - pb)
        ov = r_box + hl - jnp.abs(c)
        # degenerate cross -> original substitutes the face axis e_i, whose
        # overlap is already pens[i]
        pens.append(jnp.where(good, ov, pens[i]))
    pen = jnp.min(jnp.stack(pens), axis=0)
    d = jnp.where(d_sep > 0.0, d_sep, -jnp.maximum(pen, 0.0))
    return d - r


def main():
    from trajopt_tpu.collision import geometry as geom

    key = jax.random.PRNGKey(0)
    ka, kb, kc, kd = jax.random.split(key, 4)
    a = jax.random.normal(ka, (N, 3), jnp.float32)
    b = a + 0.3 * jax.random.normal(kb, (N, 3), jnp.float32)
    # random rotations via host-side QR (device QR OOMs vmem at this N)
    rng = np.random.default_rng(0)
    Qh, _ = np.linalg.qr(rng.standard_normal((N, 3, 3)))
    Q = jnp.asarray(Qh, jnp.float32)
    p_box = jax.random.normal(kd, (N, 3), jnp.float32)
    half = jnp.abs(jax.random.normal(kd, (N, 3), jnp.float32)) * 0.3 + 0.05
    r = jnp.full((N,), 0.05, jnp.float32)

    cur = jax.vmap(geom.capsule_box)

    def mk_cur(k):
        def f(a, b, r, Q, p, h):
            def body(c, _):
                return jnp.sum(cur(a + c * 1e-9, b, r, Q, p, h)) * 1e-9, None
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), None,
                                length=k)
            return c
        return jax.jit(f)

    def mk_soa(k):
        def f(a, b, r, Q, p, h):
            def body(c, _):
                return jnp.sum(capsule_box_soa(a + c * 1e-9, b, r, Q, p, h)) * 1e-9, None
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), None,
                                length=k)
            return c
        return jax.jit(f)

    # correctness first (on 1k sample)
    d_cur = np.asarray(cur(a[:1000], b[:1000], r[:1000], Q[:1000],
                           p_box[:1000], half[:1000]))
    d_soa = np.asarray(capsule_box_soa(a[:1000], b[:1000], r[:1000], Q[:1000],
                                       p_box[:1000], half[:1000]))
    err = np.max(np.abs(d_cur - d_soa))
    print(f"max |cur - soa| on 1k samples: {err:.3e}")

    t_cur = _marginal(mk_cur, a, b, r, Q, p_box, half)
    t_soa = _marginal(mk_soa, a, b, r, Q, p_box, half)
    print(f"capsule_box current (AoS [N,3]) : {t_cur*1e3:8.3f} ms/call  N={N}")
    print(f"capsule_box SoA (scalar unpack) : {t_soa*1e3:8.3f} ms/call  "
          f"speedup {t_cur/max(t_soa,1e-12):.1f}x")

    # gradient-path comparison (value_and_grad w.r.t. poses, vmapped)
    def g_cur(a1, b1, r1, Q1, p1, h1):
        def f(Q_, p_):
            return geom.capsule_box(a1, b1, r1, Q_, p_, h1)
        return jax.value_and_grad(f, argnums=(0, 1))(Q1, p1)

    def g_soa(a1, b1, r1, Q1, p1, h1):
        def f(Q_, p_):
            return capsule_box_soa(a1, b1, r1, Q_, p_, h1)
        return jax.value_and_grad(f, argnums=(0, 1))(Q1, p1)

    def mk_g(fn):
        def mk(k):
            def f(a, b, r, Q, p, h):
                def body(c, _):
                    d, (gQ, gp) = jax.vmap(fn)(a + c * 1e-9, b, r, Q, p, h)
                    return (jnp.sum(d) + jnp.sum(gQ) + jnp.sum(gp)) * 1e-9, None
                c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), None,
                                    length=k)
                return c
            return jax.jit(f)
        return mk

    tg_cur = _marginal(mk_g(g_cur), a, b, r, Q, p_box, half)
    tg_soa = _marginal(mk_g(g_soa), a, b, r, Q, p_box, half)
    print(f"grad path current               : {tg_cur*1e3:8.3f} ms/call")
    print(f"grad path SoA                   : {tg_soa*1e3:8.3f} ms/call  "
          f"speedup {tg_cur/max(tg_soa,1e-12):.1f}x")


if __name__ == "__main__":
    main()
