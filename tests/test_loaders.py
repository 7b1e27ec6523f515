"""Scene I/O tests: OBJ and COLLADA loaders (reference component #3,
SURVEY.md §2 row 3) against synthesized files."""

import textwrap

import jax
import numpy as np
import pytest

from tpu_pt.config import RenderConfig
from tpu_pt.render.driver import render
from tpu_pt.scene import collada, obj
from tpu_pt.scene.types import LIGHT_POINT, LIGHT_TRI, MAT_EMISSIVE

OBJ_TEXT = """
mtllib box.mtl
v -1 0 -1
v -1 0 1
v 1 0 1
v 1 0 -1
v 0 1 0
usemtl white
f 1 2 3 4
usemtl lamp
f 1 2 5
"""

MTL_TEXT = """
newmtl white
Kd 0.7 0.6 0.5
newmtl lamp
Kd 0 0 0
Ke 5 5 5
"""

DAE_TEXT = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
 <library_effects>
  <effect id="red-fx"><profile_COMMON><technique sid="common"><lambert>
    <diffuse><color>0.8 0.1 0.1 1</color></diffuse>
  </lambert></technique></profile_COMMON></effect>
  <effect id="glow-fx"><profile_COMMON><technique sid="common"><lambert>
    <emission><color>4 4 4 1</color></emission>
  </lambert></technique></profile_COMMON></effect>
 </library_effects>
 <library_materials>
  <material id="red" name="red"><instance_effect url="#red-fx"/></material>
  <material id="glow" name="glow"><instance_effect url="#glow-fx"/></material>
 </library_materials>
 <library_geometries>
  <geometry id="quad"><mesh>
   <source id="quad-pos"><float_array id="qp" count="12">-1 0 -1 -1 0 1 1 0 1 1 0 -1</float_array></source>
   <vertices id="quad-vtx"><input semantic="POSITION" source="#quad-pos"/></vertices>
   <polylist material="m0" count="1">
    <input semantic="VERTEX" source="#quad-vtx" offset="0"/>
    <vcount>4</vcount>
    <p>0 1 2 3</p>
   </polylist>
  </mesh></geometry>
  <geometry id="lamp"><mesh>
   <source id="lamp-pos"><float_array id="lp" count="9">-0.3 2 -0.3 0.3 2 -0.3 0 2 0.3</float_array></source>
   <vertices id="lamp-vtx"><input semantic="POSITION" source="#lamp-pos"/></vertices>
   <triangles material="m1" count="1">
    <input semantic="VERTEX" source="#lamp-vtx" offset="0"/>
    <p>0 1 2</p>
   </triangles>
  </mesh></geometry>
 </library_geometries>
 <library_cameras>
  <camera id="cam"><optics><technique_common><perspective>
   <yfov>45</yfov>
  </perspective></technique_common></optics></camera>
 </library_cameras>
 <library_lights>
  <light id="pt"><technique_common><point><color>2 2 2</color></point></technique_common></light>
 </library_lights>
 <library_visual_scenes>
  <visual_scene id="scene">
   <node id="floor"><instance_geometry url="#quad">
     <bind_material><technique_common>
       <instance_material symbol="m0" target="#red"/>
     </technique_common></bind_material>
   </instance_geometry></node>
   <node id="lampnode"><translate>0 0 0</translate><instance_geometry url="#lamp">
     <bind_material><technique_common>
       <instance_material symbol="m1" target="#glow"/>
     </technique_common></bind_material>
   </instance_geometry></node>
   <node id="lightnode"><translate>0 3 0</translate><instance_light url="#pt"/></node>
   <node id="camnode"><translate>0 2 4</translate><instance_camera url="#cam"/></node>
  </visual_scene>
 </library_visual_scenes>
</COLLADA>
"""


class TestObj:
    def test_load_and_triangulate(self, tmp_path):
        (tmp_path / "box.obj").write_text(OBJ_TEXT)
        (tmp_path / "box.mtl").write_text(MTL_TEXT)
        scene, cam_fn = obj.load(str(tmp_path / "box.obj"))
        # quad fan-triangulated into 2 + 1 emissive tri
        assert scene.n_tris == 3
        kinds = np.asarray(scene.materials.kind)
        mats = np.asarray(scene.tri_mat)
        assert (kinds[mats] == MAT_EMISSIVE).sum() == 1
        np.testing.assert_allclose(
            np.asarray(scene.materials.albedo)[mats[0]], [0.7, 0.6, 0.5]
        )

    def test_render_smoke(self, tmp_path):
        (tmp_path / "box.obj").write_text(OBJ_TEXT)
        (tmp_path / "box.mtl").write_text(MTL_TEXT)
        scene, cam_fn = obj.load(str(tmp_path / "box.obj"))
        cfg = RenderConfig(width=12, height=12, spp=2, direct_only=True)
        img = render(scene, cam_fn(12, 12), cfg, jax.random.key(0),
                     backend="brute")
        assert np.isfinite(img).all()
        assert img.mean() > 0


class TestCollada:
    def test_load_structure(self, tmp_path):
        p = tmp_path / "scene.dae"
        p.write_text(DAE_TEXT)
        scene, cam_fn = collada.load(str(p))
        assert scene.n_tris == 3  # polylist quad (2) + lamp tri (1)
        kinds = np.asarray(scene.lights.kind)
        assert (kinds == LIGHT_POINT).sum() == 1
        assert (kinds == LIGHT_TRI).sum() == 1  # derived from emissive lamp
        # point light position transformed by node translate
        pt = np.asarray(scene.lights.position)[kinds == LIGHT_POINT][0]
        np.testing.assert_allclose(pt, [0, 3, 0], atol=1e-6)

    def test_camera_from_dae(self, tmp_path):
        p = tmp_path / "scene.dae"
        p.write_text(DAE_TEXT)
        scene, cam_fn = collada.load(str(p))
        cam = cam_fn(16, 16)
        np.testing.assert_allclose(np.asarray(cam.origin), [0, 2, 4], atol=1e-5)

    def test_render_smoke(self, tmp_path):
        p = tmp_path / "scene.dae"
        p.write_text(DAE_TEXT)
        scene, cam_fn = collada.load(str(p))
        cfg = RenderConfig(width=12, height=12, spp=2, direct_only=True)
        img = render(scene, cam_fn(12, 12), cfg, jax.random.key(0),
                     backend="brute")
        assert np.isfinite(img).all()
        assert img.mean() > 0


DAE_NORMALS_SPHERE = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
 <library_materials>
  <material id="m"><instance_effect url="#none"/></material>
 </library_materials>
 <library_geometries>
  <geometry id="slope"><mesh>
   <source id="sp"><float_array id="spa" count="9">0 0 0 1 0 0 0 0 1</float_array></source>
   <source id="sn"><float_array id="sna" count="9">0 0.8 0.6 0 0.8 0.6 0 0.8 0.6</float_array></source>
   <vertices id="sv"><input semantic="POSITION" source="#sp"/></vertices>
   <triangles material="m0" count="1">
    <input semantic="VERTEX" source="#sv" offset="0"/>
    <input semantic="NORMAL" source="#sn" offset="1"/>
    <p>0 0 1 1 2 2</p>
   </triangles>
  </mesh></geometry>
  <geometry id="ball"><mesh><sphere radius="0.5"/></mesh></geometry>
 </library_geometries>
 <library_visual_scenes>
  <visual_scene id="scene">
   <node id="a"><instance_geometry url="#slope"/></node>
   <node id="b"><translate>2 1 0</translate><scale>2 2 2</scale>
     <instance_geometry url="#ball"/></node>
  </visual_scene>
 </library_visual_scenes>
</COLLADA>
"""


class TestColladaNormalsAndSpheres:
    def test_authored_normals_round_trip(self, tmp_path):
        """VERDICT r1 missing #6: the NORMAL input must drive shading
        normals, not be recomputed (authored normals here are tilted off
        the geometric normal, so recomputation would differ)."""
        p = tmp_path / "ns.dae"
        p.write_text(DAE_NORMALS_SPHERE)
        scene, _ = collada.load(str(p))
        n = np.asarray(scene.normals)[:3]
        np.testing.assert_allclose(n, [[0, 0.8, 0.6]] * 3, atol=1e-6)

    def test_sphere_instanced_with_transform(self, tmp_path):
        p = tmp_path / "ns.dae"
        p.write_text(DAE_NORMALS_SPHERE)
        scene, _ = collada.load(str(p))
        assert scene.n_spheres == 1
        np.testing.assert_allclose(
            np.asarray(scene.sph_center)[0], [2, 1, 0], atol=1e-6)
        np.testing.assert_allclose(
            float(np.asarray(scene.sph_radius)[0]), 1.0, atol=1e-6)

    def test_normals_shade_differently_than_recomputed(self, tmp_path):
        """The authored (tilted) normals must actually change shading
        vs area-weighted recomputation."""
        import jax.numpy as jnp

        from tpu_pt.scene.types import _vertex_normals

        p = tmp_path / "ns.dae"
        p.write_text(DAE_NORMALS_SPHERE)
        scene, cam_fn = collada.load(str(p))
        recomputed = _vertex_normals(np.asarray(scene.vertices),
                                     np.asarray(scene.tri_idx))
        assert np.abs(np.asarray(scene.normals)[:3] - recomputed[:3]).max() \
            > 0.1


DAE_EXTRA_LIGHTS = DAE_TEXT.replace(
    '<light id="pt"><technique_common><point><color>2 2 2</color></point>'
    '</technique_common></light>',
    '<light id="pt"><technique_common><spot><color>2 2 2</color>'
    '<falloff_angle>60</falloff_angle><falloff_exponent>2.5</falloff_exponent>'
    '</spot></technique_common></light>\n'
    '  <light id="quadlight"><technique_common><point><color>9 8 7</color>'
    '</point></technique_common>'
    '<extra><technique profile="ext"><area>'
    '<size_x>0.6</size_x><size_y>0.4</size_y><color>9 8 7</color>'
    '</area></technique></extra></light>',
).replace(
    '<node id="lightnode"><translate>0 3 0</translate>'
    '<instance_light url="#pt"/></node>',
    '<node id="lightnode"><translate>0 3 0</translate>'
    '<instance_light url="#pt"/></node>\n'
    '   <node id="quadnode"><translate>0 2.9 0</translate>'
    '<instance_light url="#quadlight"/></node>',
)


class TestColladaLightTail:
    def test_spot_exponent_and_extra_area(self, tmp_path):
        """COLLADA tail (VERDICT r3 task 8): <falloff_exponent> lands in
        the spot row, and an <extra> area technique yields a quad light
        with node-transform edges."""
        import numpy as np

        from tpu_pt.scene import collada
        from tpu_pt.scene.types import LIGHT_AREA, LIGHT_SPOT

        path = tmp_path / "s.dae"
        path.write_text(DAE_EXTRA_LIGHTS)
        scene, _ = collada.load(str(path))
        kinds = np.asarray(scene.lights.kind)
        spot = int(np.flatnonzero(kinds == LIGHT_SPOT)[0])
        area = int(np.flatnonzero(kinds == LIGHT_AREA)[0])
        ex = np.asarray(scene.lights.edge_x)
        np.testing.assert_allclose(ex[spot, 0], np.cos(np.deg2rad(30.0)),
                                   rtol=1e-6)          # half of 60 deg
        np.testing.assert_allclose(ex[spot, 1], 2.5)   # exponent
        # Area quad: 0.6 x 0.4 in the node's XY plane, emitting down -Z.
        ey = np.asarray(scene.lights.edge_y)
        np.testing.assert_allclose(np.linalg.norm(ex[area]), 0.6, rtol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(ey[area]), 0.4, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(scene.lights.radiance)[area],
                                   [9, 8, 7], rtol=1e-6)
        center = (np.asarray(scene.lights.position)[area]
                  + 0.5 * ex[area] + 0.5 * ey[area])
        np.testing.assert_allclose(center, [0, 2.9, 0], atol=1e-6)
