"""Approximate convex decomposition (VHACD analog) tests.

Mirrors VHACD's role in the reference: concave mesh -> convex pieces that
a collision environment consumes (trajopt_ext/vhacd)."""

import numpy as np
import jax.numpy as jnp
import pytest

from trajopt_tpu.collision import decompose as dc
from trajopt_tpu.collision.world import CollisionScene
from trajopt_tpu.models.robots import spherebot


def _coverage(pieces, pts, tol=1e-5):
    """Fraction of points inside the union of fitted pieces."""
    ok = 0
    for p in pts:
        if any(dc.contains(pc, p, tol) for pc in pieces):
            ok += 1
    return ok / len(pts)


def test_convex_box_is_one_tight_piece():
    m = dc.box_mesh([0.3, 0.2, 0.5], center=[1.0, -2.0, 0.1])
    pieces = dc.decompose(m, max_concavity=0.01)
    assert len(pieces) == 1
    pc = pieces[0]
    assert pc.kind == "box"
    np.testing.assert_allclose(np.sort(pc.params[0]), [0.2, 0.3, 0.5],
                               atol=1e-6)
    np.testing.assert_allclose(pc.center, [1.0, -2.0, 0.1], atol=1e-6)
    assert _coverage(pieces, m.vertices) == 1.0


def test_elongated_cloud_prefers_capsule():
    rng = np.random.default_rng(0)
    axis = np.asarray([1.0, 0.0, 0.0])
    t = rng.uniform(-2.0, 2.0, (400, 1))
    ring = rng.normal(size=(400, 3))
    ring[:, 0] = 0.0
    ring = 0.2 * ring / np.maximum(
        np.linalg.norm(ring, axis=1, keepdims=True), 1e-9)
    pts = t * axis + ring
    piece = dc.fit_primitive(pts)
    assert piece.kind == "capsule"
    assert _coverage([piece], pts) == 1.0


def test_l_shape_splits_into_multiple_pieces():
    # concave L: two overlapping boxes
    m = dc.concat_meshes(
        dc.box_mesh([1.0, 0.2, 0.2], center=[0.0, 0.0, 0.0]),
        dc.box_mesh([0.2, 1.0, 0.2], center=[0.8, 0.8, 0.0]),
    )
    one = dc.decompose(m, max_concavity=np.inf)  # forced single piece
    assert len(one) == 1
    pieces = dc.decompose(m, max_concavity=0.05)
    assert len(pieces) >= 2
    assert _coverage(pieces, m.vertices, tol=1e-4) == 1.0
    # decomposition should be much tighter than one enclosing primitive
    assert sum(p.volume for p in pieces) < 0.7 * one[0].volume


def test_decompose_respects_max_pieces():
    m = dc.concat_meshes(*[
        dc.box_mesh([0.1, 0.1, 0.1], center=[i * 0.5, (i % 3) * 0.4, 0.0])
        for i in range(6)
    ])
    pieces = dc.decompose(m, max_concavity=1e-4, max_pieces=3)
    assert len(pieces) <= 3


def test_obj_roundtrip(tmp_path):
    m = dc.box_mesh([0.5, 0.5, 0.5])
    path = tmp_path / "box.obj"
    with open(path, "w") as f:
        for v in m.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in m.faces:
            f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")
    m2 = dc.load_obj(str(path))
    assert m2.vertices.shape == m.vertices.shape
    assert m2.faces.shape == m.faces.shape


def test_scene_integration_world_and_link():
    tree = spherebot()
    scene = CollisionScene(tree)
    scene.add_link_sphere(tree.link_names[-1], 0.25)
    m = dc.concat_meshes(
        dc.box_mesh([0.5, 0.1, 0.5], center=[1.5, 0.0, 0.0]),
        dc.box_mesh([0.1, 0.5, 0.5], center=[1.9, 0.4, 0.0]),
    )
    pieces = dc.add_decomposition(scene, m, name="obstacle",
                                  max_concavity=0.05)
    assert len(pieces) >= 2
    d = scene.distances(jnp.zeros(2))
    assert d.shape[0] >= len(pieces)
    assert bool(jnp.all(jnp.isfinite(d)))
    # attached (link) variant also registers
    scene2 = CollisionScene(tree)
    dc.add_decomposition(scene2, dc.box_mesh([0.1, 0.1, 0.3]),
                         link=tree.link_names[-1], name="tool")
    scene2.add_world_box("wall", [0.2, 2.0, 1.0], center=[2.0, 0.0, 0.0])
    d2 = scene2.distances(jnp.zeros(2))
    assert bool(jnp.all(jnp.isfinite(d2)))
