"""Kinematic tree: batched forward kinematics + analytic geometric Jacobian.

TPU-native replacement for ``tesseract::kinematics::JointGroup`` —
``calcFwdKin`` / ``calcJacobian`` / ``getLimits`` as used by the reference's
kinematic and collision terms (``trajopt/src/problem_description.cpp:556``,
``collision_terms.cpp:217,285``).

Design: joints are processed in a static topological order (a Python loop
unrolled at trace time — the tree is tiny), producing world (R, p) for every
link.  The geometric Jacobian is analytic: for an active revolute joint i
that is an ancestor of the link, the column is [z_i x (p - p_i); z_i]; for
prismatic, [z_i; 0].  Everything vmaps over leading batch/time axes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from trajopt_tpu.kinematics import urdf as urdf_mod
from trajopt_tpu.kinematics.transforms import axis_angle_matrix, compose


def _np_rpy_matrix(rpy) -> np.ndarray:
    """Pure-numpy URDF fixed-axis RPY (R = Rz @ Ry @ Rx).

    FK constants must be host-side numpy even when first requested inside a
    jit trace (jnp ops would be staged and return tracers there).

    Entries within 1e-15 of {0, +-1} are snapped exactly (cos/sin of
    multiples of pi/2 carry ~1e-17 noise): the SoA FK form folds exact
    structural zeros at trace time, and applying the same snapping here
    keeps all three FK forms (unrolled / scan / soa) bit-identical."""
    r, p, y = float(rpy[0]), float(rpy[1]), float(rpy[2])
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    R = np.array([
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr],
    ])
    return np.where(np.abs(R) < 1e-15, 0.0,
                    np.where(np.abs(R - 1.0) < 1e-15, 1.0,
                             np.where(np.abs(R + 1.0) < 1e-15, -1.0, R)))


@dataclasses.dataclass(frozen=True)
class KinematicTree:
    """Static description; all jnp work happens in fk()/jacobian().

    Attributes:
      link_names: all link names, index = link id; root is index 0.
      joints: topo-ordered UrdfJoint tuple.
      parent_link: per joint, parent link id.
      child_link: per joint, child link id.
      q_index: per joint, index into q (or -1 for fixed).
      active_joint_names / lower / upper: active-joint metadata.
      ancestor: [n_links, n_active] bool — active joint j moves link l.
    """

    link_names: tuple[str, ...]
    joints: tuple[urdf_mod.UrdfJoint, ...]
    parent_link: tuple[int, ...]
    child_link: tuple[int, ...]
    q_index: tuple[int, ...]
    active_joint_names: tuple[str, ...]
    lower: np.ndarray
    upper: np.ndarray
    ancestor: np.ndarray
    # FK implementation: "soa" (scalar-form unrolled, TPU default — full
    # vector lanes under vmap), "scan" (one HLO scan body per call site,
    # the compile-time lever), or "unrolled" (matrix-form reference).
    fk_mode: str = "soa"

    @property
    def n_dof(self) -> int:
        return len(self.active_joint_names)

    @property
    def n_links(self) -> int:
        return len(self.link_names)

    def link_id(self, name: str) -> int:
        return self.link_names.index(name)

    # ----------------------------------------------------------------- FK

    def _fk_consts(self):
        """Precomputed per-joint constant arrays for the scan-form FK."""
        cache = getattr(self, "_fk_consts_cache", None)
        if cache is not None:
            return cache
        J = len(self.joints)
        R_or = np.stack([_np_rpy_matrix(j.origin_rpy)
                         for j in self.joints])
        p_or = np.stack([np.asarray(j.origin_xyz, float)
                         for j in self.joints])
        axis = np.stack([np.asarray(j.axis, float) for j in self.joints])
        qsel = np.zeros((J, self.n_dof))
        is_rev = np.zeros(J)
        is_pri = np.zeros(J)
        for k, j in enumerate(self.joints):
            qi = self.q_index[k]
            if qi >= 0:
                qsel[k, qi] = 1.0
                if j.jtype == urdf_mod.REVOLUTE:
                    is_rev[k] = 1.0
                else:
                    is_pri[k] = 1.0
        consts = (R_or, p_or, axis, qsel, is_rev, is_pri,
                  np.asarray(self.parent_link), np.asarray(self.child_link))
        object.__setattr__(self, "_fk_consts_cache", consts)
        return consts

    def fk(self, q: jax.Array) -> tuple[jax.Array, jax.Array]:
        """World poses of all links for one configuration q [n_dof].

        Returns (R [n_links,3,3], p [n_links,3]).  vmap for batches.

        Default is the scalar-form (structure-of-arrays) unrolled FK: on
        TPU every [*,3,3] intermediate pads its two minor dims onto
        (8, 128) vector tiles (~100x idle lanes), and the lax.scan form
        additionally rewrites the whole [n_links, ...] carry every joint
        step — measured 5.7 ms for a 7680-config fk_with_axes batch vs
        ~0.6 ms scalar-form (benchmarks/narrowphase_profile.py).  Set
        fk_mode to "scan" to restore the scan form (one HLO scan body
        per call site, the round-3 compile-time lever) or "unrolled" for
        the matrix-form unrolled reference implementation."""
        mode = self.fk_mode
        if mode == "soa":
            R, p, _, _ = self._fk_soa(q, with_axes=False)
            return R, p
        if mode == "scan" and len(self.joints) >= 10:
            return self._fk_scan(q)
        return self._fk_unrolled(q)

    def _fk_unrolled(self, q: jax.Array) -> tuple[jax.Array, jax.Array]:
        dtype = q.dtype
        Rs = [None] * self.n_links
        ps = [None] * self.n_links
        Rs[0] = jnp.eye(3, dtype=dtype)
        ps[0] = jnp.zeros(3, dtype=dtype)
        for k, j in enumerate(self.joints):
            Rp, pp = Rs[self.parent_link[k]], ps[self.parent_link[k]]
            R_or = jnp.asarray(_np_rpy_matrix(j.origin_rpy), dtype)
            p_or = jnp.asarray(np.asarray(j.origin_xyz), dtype)
            Rj, pj = compose(Rp, pp, R_or, p_or)
            qi = self.q_index[k]
            if qi >= 0 and j.jtype == urdf_mod.REVOLUTE:
                Rj = Rj @ axis_angle_matrix(jnp.asarray(j.axis, dtype), q[qi])
            elif qi >= 0 and j.jtype == urdf_mod.PRISMATIC:
                pj = pj + Rj @ (jnp.asarray(j.axis, dtype) * q[qi])
            Rs[self.child_link[k]] = Rj
            ps[self.child_link[k]] = pj
        return jnp.stack(Rs), jnp.stack(ps)

    def _fk_scan(self, q: jax.Array) -> tuple[jax.Array, jax.Array]:
        dtype = q.dtype
        R_or, p_or, axis, qsel, is_rev, is_pri, par, chd = self._fk_consts()
        theta = jnp.asarray(qsel, dtype) @ q                  # [J]
        R0 = jnp.zeros((self.n_links, 3, 3), dtype).at[0].set(
            jnp.eye(3, dtype=dtype))
        p0 = jnp.zeros((self.n_links, 3), dtype)
        xs = (jnp.asarray(R_or, dtype), jnp.asarray(p_or, dtype),
              jnp.asarray(axis, dtype), theta,
              jnp.asarray(is_rev, dtype), jnp.asarray(is_pri, dtype),
              jnp.asarray(par), jnp.asarray(chd))

        def step(carry, x):
            Rs, ps = carry
            Ro, po, ax, th, rev, pri, pk, ck = x
            Rp = Rs[pk]
            pp = ps[pk]
            Rj = Rp @ Ro
            pj = Rp @ po + pp
            # angle 0 -> identity, so fixed/prismatic joints pass through
            Rj = Rj @ axis_angle_matrix(ax, th * rev)
            pj = pj + Rj @ (ax * (th * pri))
            return (Rs.at[ck].set(Rj), ps.at[ck].set(pj)), None

        (Rs, ps), _ = jax.lax.scan(step, (R0, p0), xs)
        return Rs, ps

    def _fk_soa(self, q: jax.Array, with_axes: bool):
        """Scalar-form unrolled FK (and optional joint axes/origins).

        Identical math to :meth:`_fk_unrolled`, but every rotation is
        carried as 9 individual scalars and every point as 3, so all
        intermediates under vmap have the pure batch shape (full lanes on
        TPU) and constant origin/axis entries fold away at trace time.
        Returns packed (R [L,3,3], p [L,3], z [n_dof,3] | None,
        o [n_dof,3] | None)."""
        dtype = q.dtype
        zero = jnp.zeros((), dtype)
        one = jnp.ones((), dtype)

        # None represents an exact structural zero (folded at trace time).
        def cmul(c, a):
            c = float(c)
            if c == 0.0 or a is None:
                return None
            if c == 1.0:
                return a
            if c == -1.0:
                return -a
            return c * a

        def amul(a, b):
            return None if (a is None or b is None) else a * b

        def acc(*terms):
            out = None
            for t in terms:
                if t is None:
                    continue
                out = t if out is None else out + t
            return out

        def z_of(a):
            return zero if a is None else a

        def mat_const(A, C):
            """A (3x3 scalars) @ C (3x3 numpy constants)."""
            return [[acc(*(cmul(C[k][j], A[i][k]) for k in range(3)))
                     for j in range(3)] for i in range(3)]

        def vec_const(A, v):
            """A @ v for constant 3-vector v."""
            return [acc(*(cmul(v[k], A[i][k]) for k in range(3)))
                    for i in range(3)]

        def matmat(A, B):
            return [[acc(*(amul(A[i][k], B[k][j]) for k in range(3)))
                     for j in range(3)] for i in range(3)]

        Rs: list = [None] * self.n_links
        ps: list = [None] * self.n_links
        Rs[0] = [[one, None, None], [None, one, None], [None, None, one]]
        ps[0] = [None, None, None]
        z_ax: list = [None] * self.n_dof
        o_ax: list = [None] * self.n_dof

        for k, j in enumerate(self.joints):
            Rp = Rs[self.parent_link[k]]
            pp = ps[self.parent_link[k]]
            R_or = _np_rpy_matrix(j.origin_rpy)  # snapped constants fold
            p_or = np.asarray(j.origin_xyz, float)
            Rj = mat_const(Rp, R_or)
            pv = vec_const(Rp, p_or)
            pj = [acc(pv[i], pp[i]) for i in range(3)]
            qi = self.q_index[k]
            if qi >= 0 and j.jtype == urdf_mod.REVOLUTE:
                x, y, z = (float(v) for v in j.axis)
                th = q[qi]
                c = jnp.cos(th)
                s = jnp.sin(th)
                C = 1.0 - c
                Raa = [[acc(c, cmul(x * x, C)),
                        acc(cmul(x * y, C), cmul(-z, s)),
                        acc(cmul(x * z, C), cmul(y, s))],
                       [acc(cmul(y * x, C), cmul(z, s)),
                        acc(c, cmul(y * y, C)),
                        acc(cmul(y * z, C), cmul(-x, s))],
                       [acc(cmul(z * x, C), cmul(-y, s)),
                        acc(cmul(z * y, C), cmul(x, s)),
                        acc(c, cmul(z * z, C))]]
                Rj = matmat(Rj, Raa)
            elif qi >= 0 and j.jtype == urdf_mod.PRISMATIC:
                d = vec_const(Rj, np.asarray(j.axis, float))
                th = q[qi]
                pj = [acc(pj[i], amul(d[i], th)) for i in range(3)]
            Rs[self.child_link[k]] = Rj
            ps[self.child_link[k]] = pj
            if with_axes and qi >= 0:
                z_ax[qi] = vec_const(Rj, np.asarray(j.axis, float))
                o_ax[qi] = pj

        def pack_mats(mats):
            return jnp.stack([jnp.stack([jnp.stack([z_of(e) for e in row])
                                         for row in M]) for M in mats])

        def pack_vecs(vecs):
            if not vecs:  # n_dof == 0 degenerate tree
                return jnp.zeros((0, 3), dtype)
            return jnp.stack([jnp.stack([z_of(e) for e in v]) for v in vecs])

        R = pack_mats(Rs)
        p = pack_vecs(ps)
        if not with_axes:
            return R, p, None, None
        return R, p, pack_vecs(z_ax), pack_vecs(o_ax)

    def fk_with_axes(self, q: jax.Array):
        """FK plus per-active-joint world axis z_i and origin o_i (for the
        geometric Jacobian).

        The joint frame = child link frame; for revolute joints the axis
        is unaffected by the joint's own rotation, so Rc @ axis is exact
        for both types."""
        if self.fk_mode == "soa":
            R, p, z, o = self._fk_soa(q, with_axes=True)
            return R, p, z, o
        dtype = q.dtype
        R, p = self.fk(q)
        cache = getattr(self, "_axes_consts_cache", None)
        if cache is None:
            child = np.zeros(self.n_dof, np.int64)
            ax = np.zeros((self.n_dof, 3))
            for k, j in enumerate(self.joints):
                qi = self.q_index[k]
                if qi >= 0:
                    child[qi] = self.child_link[k]
                    ax[qi] = np.asarray(j.axis, float)
            cache = (child, ax)
            object.__setattr__(self, "_axes_consts_cache", cache)
        child, ax = cache
        Rc = R[jnp.asarray(child)]                            # [n_dof,3,3]
        z = jnp.einsum("jik,jk->ji", Rc, jnp.asarray(ax, dtype))
        o = p[jnp.asarray(child)]
        return R, p, z, o

    def jacobian(self, q: jax.Array, link: int | str,
                 ref_point: jax.Array | None = None) -> jax.Array:
        """Geometric Jacobian [6, n_dof] ([linear; angular]) of a link (or a
        point `ref_point` in world coords attached to that link), matching
        JointGroup::calcJacobian + the ref-point shift used by collision
        gradients (collision_terms.cpp:203-323)."""
        if isinstance(link, str):
            link = self.link_id(link)
        R, p, z, o = self.fk_with_axes(q)
        target = p[link] if ref_point is None else ref_point
        mask = jnp.asarray(self.ancestor[link], q.dtype)  # [n_dof]
        is_rev = jnp.asarray(self._active_types() == 0)
        lin_rev = jnp.cross(z, target[None, :] - o)        # [n_dof, 3]
        lin = jnp.where(is_rev[:, None], lin_rev, z) * mask[:, None]
        ang = jnp.where(is_rev[:, None], z, jnp.zeros_like(z)) * mask[:, None]
        return jnp.concatenate([lin.T, ang.T], axis=0)     # [6, n_dof]

    def _active_types(self) -> np.ndarray:
        out = np.zeros(self.n_dof, np.int32)
        for k, j in enumerate(self.joints):
            qi = self.q_index[k]
            if qi >= 0:
                out[qi] = 0 if j.jtype == urdf_mod.REVOLUTE else 1
        return out


def build_tree(model: urdf_mod.UrdfModel,
               active_joints: list[str] | None = None) -> KinematicTree:
    """Topologically sort the URDF joint graph into a KinematicTree.

    ``active_joints`` selects/orders the actuated joints (like a tesseract
    JointGroup built from an SRDF group); default = all non-fixed joints in
    topological order.
    """
    children = {j.parent: [] for j in model.joints}
    for j in model.joints:
        children.setdefault(j.parent, []).append(j)
    child_names = {j.child for j in model.joints}
    roots = [l.name for l in model.links if l.name not in child_names]
    if len(roots) != 1:
        raise ValueError(f"expected single root link, got {roots}")

    link_names = [roots[0]]
    ordered: list[urdf_mod.UrdfJoint] = []
    stack = [roots[0]]
    while stack:
        link = stack.pop()
        for j in children.get(link, []):
            ordered.append(j)
            link_names.append(j.child)
            stack.append(j.child)

    name_to_id = {n: i for i, n in enumerate(link_names)}
    parent_link = tuple(name_to_id[j.parent] for j in ordered)
    child_link = tuple(name_to_id[j.child] for j in ordered)

    if active_joints is None:
        # URDF document order (the conventional joint ordering), not the
        # DFS traversal order used internally for FK.
        active_joints = [j.name for j in model.joints
                         if j.jtype != urdf_mod.FIXED]
    q_of = {n: i for i, n in enumerate(active_joints)}
    q_index = tuple(
        q_of.get(j.name, -1) if j.jtype != urdf_mod.FIXED else -1
        for j in ordered)

    lower = np.array([next(j.lower for j in ordered if j.name == n)
                      for n in active_joints])
    upper = np.array([next(j.upper for j in ordered if j.name == n)
                      for n in active_joints])

    # ancestor[l, qi]: does active joint qi move link l?
    n_links = len(link_names)
    n_active = len(active_joints)
    ancestor = np.zeros((n_links, n_active), bool)
    parent_of_link = {child_link[k]: (parent_link[k], k) for k in range(len(ordered))}
    for l in range(n_links):
        cur = l
        while cur in parent_of_link:
            p, k = parent_of_link[cur]
            if q_index[k] >= 0:
                ancestor[l, q_index[k]] = True
            cur = p

    return KinematicTree(
        link_names=tuple(link_names),
        joints=tuple(ordered),
        parent_link=parent_link,
        child_link=child_link,
        q_index=q_index,
        active_joint_names=tuple(active_joints),
        lower=lower,
        upper=upper,
        ancestor=ancestor,
    )
