"""Scene-graph tests: transform composition, instancing, lights, and the
edit -> re-render round trip (reference dynamic_scene layer, SURVEY.md §2
row 5)."""

import jax
import numpy as np

from tpu_pt.config import RenderConfig
from tpu_pt.render.driver import render
from tpu_pt.scene.graph import Node, SceneGraph, rotate, scale, translate
from tpu_pt.scene.types import LIGHT_AREA, LIGHT_POINT, MAT_DIFFUSE

TRI = dict(
    vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
    tris=np.array([[0, 1, 2]], np.int32),
)


def test_nested_transforms_compose():
    g = SceneGraph()
    parent = g.root.add(Node(name="p", transform=translate((10, 0, 0))))
    child = parent.add(Node(name="c", transform=rotate((0, 0, 1), 90),
                            mesh=dict(**TRI)))
    s = g.get_static_scene()
    # Rotation by 90° about z maps (1,0,0) -> (0,1,0), then translate +10x.
    np.testing.assert_allclose(
        np.asarray(s.vertices[:3]),
        [[10, 0, 0], [10, 1, 0], [9, 0, 0]], atol=1e-6)


def test_instancing_duplicates_with_transforms():
    g = SceneGraph()
    mesh = dict(**TRI)  # ONE mesh dict, two nodes
    g.root.add(Node(transform=translate((0, 0, 0)), mesh=mesh))
    g.root.add(Node(transform=translate((5, 0, 0)), mesh=mesh))
    s = g.get_static_scene()
    assert s.n_tris == 2
    np.testing.assert_allclose(np.asarray(s.vertices[3]), [5, 0, 0],
                               atol=1e-6)


def test_sphere_scale_and_material():
    g = SceneGraph()
    g.set_material("red", kind=MAT_DIFFUSE, albedo=(0.8, 0.1, 0.1))
    g.root.add(Node(transform=scale(2.0),
                    sphere=dict(center=(1, 0, 0), radius=0.5,
                                material="red")))
    s = g.get_static_scene()
    np.testing.assert_allclose(np.asarray(s.sph_center[0]), [2, 0, 0],
                               atol=1e-6)
    np.testing.assert_allclose(float(s.sph_radius[0]), 1.0, rtol=1e-6)
    mid = int(s.sph_mat[0])
    np.testing.assert_allclose(np.asarray(s.materials.albedo[mid]),
                               [0.8, 0.1, 0.1], rtol=1e-6)


def test_light_transforms():
    g = SceneGraph()
    n = g.root.add(Node(transform=translate((0, 5, 0))))
    n.add(Node(light=dict(kind=LIGHT_POINT, position=(1, 0, 0),
                          radiance=(9, 9, 9))))
    s = g.get_static_scene()
    np.testing.assert_allclose(np.asarray(s.lights.position[0]), [1, 5, 0],
                               atol=1e-6)


def test_edit_then_rerender_roundtrip():
    """The reference's MeshEdit -> render loop: flatten, render, move a
    node, flatten again, render — the image must change accordingly."""
    g = SceneGraph()
    g.set_material("white", kind=MAT_DIFFUSE, albedo=(0.7, 0.7, 0.7))
    # Floor quad + one point light + camera looking down.
    floor = np.array([[-2, 0, -2], [-2, 0, 2], [2, 0, 2], [2, 0, -2]],
                     np.float32)
    g.root.add(Node(name="floor", mesh=dict(
        vertices=floor, tris=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        material="white")))
    g.root.add(Node(name="lamp", transform=translate((0, 2, 0)),
                    light=dict(kind=LIGHT_POINT, position=(0, 0, 0),
                               radiance=(10, 10, 10))))
    g.root.add(Node(name="cam", camera=dict(eye=(0, 3, 0.01),
                                            target=(0, 0, 0), hfov=60)))
    cfg = RenderConfig(width=8, height=8, spp=2, direct_only=True)
    s1 = g.get_static_scene()
    cam = g.get_camera(8, 8)
    img1 = np.asarray(render(s1, cam, cfg, jax.random.key(0),
                             backend="brute"))
    # EDIT: lift the lamp twice as high -> floor gets darker (1/r^2).
    g.node("lamp").transform = translate((0, 4, 0))
    s2 = g.get_static_scene()
    img2 = np.asarray(render(s2, g.get_camera(8, 8), cfg, jax.random.key(0),
                             backend="brute"))
    assert img1.mean() > 0.01
    assert img2.mean() < img1.mean() * 0.6, (img1.mean(), img2.mean())


def test_camera_transform():
    g = SceneGraph()
    n = g.root.add(Node(transform=translate((0, 0, 5))))
    n.add(Node(camera=dict(eye=(0, 0, 0), target=(0, 0, -1), hfov=45)))
    g.get_static_scene()
    cam = g.get_camera(16, 16)
    assert cam is not None
    np.testing.assert_allclose(np.asarray(cam.origin), [0, 0, 5], atol=1e-6)
