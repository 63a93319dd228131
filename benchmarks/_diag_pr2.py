"""Diagnostic: solve the verbatim arm_around_table fixture, then verify
with (a) whole-gap swept, (b) LVS-subdivided swept (reference's 0.05
check), (c) dense discrete interpolation."""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Same host-bug mitigations as tests/conftest.py: cap codegen ISA (the
# fleet's jaxlib targets AMX hosts; LLVM JIT fails on others).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=AVX512").strip()
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from trajopt_tpu.collision.world import scene_from_urdf
from trajopt_tpu.kinematics.chain import build_tree
from trajopt_tpu.kinematics.srdf import load_srdf, resolve_group_joints
from trajopt_tpu.kinematics.urdf import load_urdf
from trajopt_tpu.problem.json_io import Environment, construct_problem

REF_DATA = "/root/reference/trajopt_common/data"

model = load_urdf(f"{REF_DATA}/arm_around_table.urdf")
srdf = load_srdf(f"{REF_DATA}/pr2.srdf")
active = resolve_group_joints(model, srdf, "right_arm")
tree = build_tree(model, active_joints=active)
scene = scene_from_urdf(tree, model, srdf,
                        package_map={"trajopt_common":
                                     os.path.dirname(REF_DATA)})
env = Environment(tree=tree, scene=scene)
with open(f"{REF_DATA}/config/arm_around_table.json") as f:
    doc = json.load(f)
jp = construct_problem(doc, env)
print("n_pairs:", scene.n_pairs)

# First: check the INIT trajectory with all three checks
init = np.asarray(doc["init_info"]["data"], float)


def report(traj, label):
    print(f"--- {label}")
    for g in range(5):
        q0 = jnp.asarray(traj[g])
        q1 = jnp.asarray(traj[g + 1])
        d_whole = float(jnp.min(scene.swept_distances(q0, q1)))
        # LVS-subdivided swept at 0.05 (reference checkTrajectory)
        dq = np.linalg.norm(traj[g + 1] - traj[g])
        n_sub = max(1, int(np.ceil(dq / 0.05)))
        fr = np.linspace(0.0, 1.0, n_sub + 1)
        dmin_lvs = np.inf
        for k in range(n_sub):
            qa = q0 + fr[k] * (q1 - q0)
            qb = q0 + fr[k + 1] * (q1 - q0)
            dmin_lvs = min(dmin_lvs,
                           float(jnp.min(scene.swept_distances(qa, qb))))
        # dense discrete
        dmin_disc = np.inf
        for k in range(2 * n_sub + 1):
            f_ = k / (2.0 * n_sub)
            q = q0 + f_ * (q1 - q0)
            dmin_disc = min(dmin_disc, float(jnp.min(scene.distances(q))))
        print(f"gap {g}: |dq|={dq:.3f} whole_swept={d_whole:+.4f} "
              f"lvs_swept={dmin_lvs:+.4f} dense_disc={dmin_disc:+.4f}")


report(init, "INIT trajectory")

res = jp.solve()
traj = np.asarray(res.x).reshape(6, 7)
print("status:", int(res.status), "iters:", int(res.n_iter),
      "max_cnt_viol:", float(jnp.max(res.cnt_viols)))
report(traj, "SOLVED trajectory")
