"""Decomposition fidelity on the reference's own PR2 collision meshes
(the trajopt_ext/vhacd role): mesh collision is trustworthy only if the
fitted primitive set (collision/decompose.py, the settings scene_from_urdf
uses: max_pieces=8, max_concavity=0.03) both COVERS the mesh surface
(conservative — no false-free configurations) and over-approximates it by
a bounded margin (no wildly inflated geometry blocking feasible motions).

Measured depths at the defaults (2026-08, reference meshes):
  Table.stl        depth_max 0.000  (exact box)
  forearm.stl      depth_max 0.036  mean 0.009   (size 0.26)
  upper_arm.stl    depth_max 0.069  mean 0.017   (size 0.54)
  gripper_palm.stl depth_max 0.018  mean 0.003   (size 0.10)
  shoulder_pan.stl depth_max 0.085  mean 0.016   (size 0.63)
  base_L.stl       depth_max 0.048  mean 0.008   (size 0.67)
"""

import os

import numpy as np
import pytest

from trajopt_tpu.collision import decompose as dc

REF_DATA = "/root/reference/trajopt_common/data"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DATA),
                                reason="reference data not available")

MESHES = [
    "meshes/Table.stl",
    "pr2/meshes/forearm_v0/forearm.stl",
    "pr2/meshes/upper_arm_v0/upper_arm.stl",
    "pr2/meshes/gripper_v0/gripper_palm.stl",
    "pr2/meshes/shoulder_v0/shoulder_pan.stl",
    "pr2/meshes/base_v0/base_L.stl",
]


def _sd_piece(piece: dc.Piece, P: np.ndarray) -> np.ndarray:
    """Signed distance of points to one fitted primitive (neg inside)."""
    if piece.kind == "sphere":
        (r,) = piece.params
        return np.linalg.norm(P - piece.center, axis=1) - r
    if piece.kind == "capsule":
        r, a, b = piece.params
        return dc._point_segment_dist(P, a, b) - r
    (half,) = piece.params
    local = (P - piece.center) @ piece.R
    q = np.abs(local) - half
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=1)
    inside = np.minimum(q.max(axis=1), 0.0)
    return outside + inside


@pytest.mark.parametrize("rel", MESHES)
def test_decomposition_covers_and_bounds_reference_mesh(rel):
    mesh = dc.load_mesh(os.path.join(REF_DATA, rel))
    pieces = dc.decompose(mesh, max_concavity=0.03, max_pieces=8)
    assert pieces, rel
    samples = dc._piece_samples(mesh, np.arange(mesh.faces.shape[0]))
    sd_union = np.stack([_sd_piece(p, samples) for p in pieces]).min(axis=0)
    size = float(np.ptp(mesh.vertices, axis=0).max())

    # 1) CONSERVATIVE: every mesh-surface sample lies inside (or on) the
    # primitive union — the decomposition can never report a colliding
    # configuration as free.
    assert float(sd_union.max()) <= 1e-9, rel

    # 2) BOUNDED over-approximation: surface samples sit at most 20% of
    # the mesh size inside the union (max) and 5% on average — the
    # primitives don't balloon far beyond the true surface.  Measured
    # worst cases: gripper_palm 17.8% max, shoulder_pan 13.4% max /
    # 2.5% mean.
    depth = -sd_union
    assert float(depth.max()) <= 0.20 * size, (rel, depth.max(), size)
    assert float(depth.mean()) <= 0.05 * size, (rel, depth.mean(), size)


def test_decomposition_piece_budget_respected():
    mesh = dc.load_mesh(os.path.join(REF_DATA,
                                     "pr2/meshes/upper_arm_v0/upper_arm.stl"))
    for mp in (2, 4, 8):
        pieces = dc.decompose(mesh, max_concavity=0.03, max_pieces=mp)
        assert 1 <= len(pieces) <= mp
