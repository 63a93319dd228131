"""Diagnostic 2: per-iteration history of the verbatim arm_around_table
solve — where does the SQP stall?"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

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

# enable per-iteration CSV logging
doc.setdefault("opt_info", {})["log_results"] = True
doc["opt_info"]["log_dir"] = "/tmp/pr2diag"
jp = construct_problem(doc, env)
print("terms:", [(t.name, t.kind, t.n_rows) for t in jp.prob.build().term_sets])
res = jp.solve()
print("status:", int(res.status), "iters:", int(res.n_iter),
      "qp:", int(res.n_qp_solves))
print("cost_vals:", np.asarray(res.cost_vals))
print("cnt_viols max:", float(np.max(res.cnt_viols)),
      "box:", float(res.box_size),
      "merit max:", float(np.max(res.merit_coeffs)))
os.system("head -40 /tmp/pr2diag/trajopt_solver.log")
