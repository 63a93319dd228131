"""Top-level API smoke test: everything a reference user needs imports
from the package root."""

import trajopt_tpu as tt


def test_all_exports_resolve():
    for name in tt.__all__:
        assert getattr(tt, name) is not None, name


def test_minimal_flow_via_top_level():
    import jax.numpy as jnp
    import numpy as np
    prob = tt.TrajOptProblem(n_steps=3, n_dof=1, joint_lower=[-5],
                             joint_upper=[5], fixed_steps=[0])
    prob.add_term(tt.joint_vel(3, 1, is_cost=True))
    prob.add_term(tt.joint_pos(3, 1, is_cost=False, targets=np.array([2.0]),
                               first_step=2, last_step=2))
    res = prob.make_solve()(tt.stationary_init(jnp.zeros(1), 3))
    assert int(res.status) == tt.SQPStatus.CONVERGED
