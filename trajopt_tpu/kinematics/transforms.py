"""SO(3)/SE(3) helpers as (R, p) pairs, batched and autodiff-safe.

Replaces Eigen::Isometry3d usage throughout the reference's kinematic terms
(``trajopt/src/kinematic_terms.cpp``).  Rotation error follows tesseract's
``calcTransformError``: relative pose ``inv(T1) * T2`` with the rotational
part as an angle-axis vector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rpy_matrix(rpy) -> jax.Array:
    """URDF fixed-axis RPY: R = Rz(yaw) @ Ry(pitch) @ Rx(roll)."""
    r, p, y = rpy[0], rpy[1], rpy[2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.array([
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr],
    ])


def axis_angle_matrix(axis, angle) -> jax.Array:
    """Rodrigues rotation about a (unit) axis."""
    axis = jnp.asarray(axis)
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    C = 1.0 - c
    x, y, z = axis[0], axis[1], axis[2]
    return jnp.array([
        [c + x * x * C, x * y * C - z * s, x * z * C + y * s],
        [y * x * C + z * s, c + y * y * C, y * z * C - x * s],
        [z * x * C - y * s, z * y * C + x * s, c + z * z * C],
    ])


def compose(Ra, pa, Rb, pb):
    """(Ra, pa) o (Rb, pb)."""
    return Ra @ Rb, Ra @ pb + pa


def invert(R, p):
    Rt = R.T
    return Rt, -(Rt @ p)


def rotvec_from_matrix(R: jax.Array) -> jax.Array:
    """Angle-axis (rotation vector) log of SO(3), safe near 0 and pi.

    Matches tesseract's calcRotationalError convention (angle in (-pi, pi]).
    """
    trace = jnp.clip(jnp.trace(R), -1.0, 3.0)
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # Skew part: (R - R^T)/2 = sin(theta) * [axis]_x
    w = 0.5 * jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    # arctan2 formulation keeps gradients finite at theta = 0 (arccos'(1) is
    # inf and would poison both jnp.where branches under autodiff).
    sin_t = jnp.sqrt(jnp.sum(w * w) + jnp.asarray(1e-30, R.dtype))
    theta = jnp.arctan2(sin_t, cos_t)

    # Small-angle: w / sinc(theta) ~ w * (1 + theta^2/6)
    small = theta < 1e-5
    scale_small = 1.0 + theta * theta / 6.0
    scale_gen = theta / jnp.where(small, 1.0, sin_t)
    rot_general = w * jnp.where(small, scale_small, scale_gen)

    # Near pi: sin(theta) -> 0 but R + I ~ 2 a a^T reveals the axis.  Take
    # the largest column of (R + I), normalize, and align its sign with the
    # skew part (at exactly pi the sign is arbitrary; +/-a are equivalent).
    near_pi = theta > jnp.pi - 1e-4
    B = R + jnp.eye(3, dtype=R.dtype)
    col_norms = jnp.sum(B * B, axis=0)
    i_max = jnp.argmax(col_norms)
    col = B[:, i_max]
    axis = col / jnp.maximum(jnp.linalg.norm(col), 1e-12)
    flip = jnp.where(jnp.dot(axis, w) < 0.0, -1.0, 1.0)
    rot_pi = axis * flip * theta
    return jnp.where(near_pi, rot_pi, rot_general)


def transform_error(R_target, p_target, R_source, p_source) -> jax.Array:
    """6-vector [translation; angle-axis] of inv(T_target) * T_source,
    mirroring tesseract::common::calcTransformError as used by
    CartPoseErrCalculator (kinematic_terms.cpp:250-263)."""
    Rt, pt = invert(R_target, p_target)
    R_rel, p_rel = compose(Rt, pt, R_source, p_source)
    return jnp.concatenate([p_rel, rotvec_from_matrix(R_rel)])


def apply_tolerances(err: jax.Array, lower: jax.Array, upper: jax.Array) -> jax.Array:
    """Shift error into the dead-band [lower, upper] (tesseract
    applyTolerances): above upper -> err-upper, below lower -> err-lower,
    inside -> 0."""
    return jnp.where(err > upper, err - upper,
                     jnp.where(err < lower, err - lower, jnp.zeros_like(err)))
