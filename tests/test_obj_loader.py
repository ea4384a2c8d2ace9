"""OBJ/MTL loader tests against the reference's in-tree assets."""

import os

import numpy as np
import pytest

from chiaroscuro_tpu.scene.obj_loader import load_mtl, load_obj
from chiaroscuro_tpu.scene.scene_arrays import build_scene_arrays


def test_cornell_box_obj(reference_data_dir):
    meshes = load_obj(os.path.join(reference_data_dir, "cornell_box.obj"))
    # 17 active quads (light + front_wall faces are commented out) -> 34 tris
    total_tris = sum(len(m.indices) for m in meshes)
    assert total_tris == 34
    # The light face is commented out, so no mesh emits...
    assert not any(m.is_light for m in meshes)
    # ...but materials resolve: red wall is red.
    by_name = {m.name: m for m in meshes}
    red = [m for m in meshes if m.name.endswith(":red")]
    assert red and np.allclose(red[0].diffuse, [1, 0, 0])
    assert by_name  # sanity

    # Flat generated normals: floor normal is +Y (CCW winding, y=0 plane).
    floor = [m for m in meshes if m.name.startswith("floor")][0]
    n = floor.normals[0]
    assert np.allclose(np.abs(n), [0, 1, 0], atol=1e-6)


def test_ka_promotion_rule(reference_data_dir):
    mtls = load_mtl(os.path.join(reference_data_dir, "cornell_box.mtl"))
    # 'light' has Ka 20 20 20 and no Ke (SURVEY.md C15 quirk).
    assert np.allclose(mtls["light"].ka, [20, 20, 20])
    assert np.allclose(mtls["light"].ke, [0, 0, 0])
    # view_test materials have Ka <= 0.5: must NOT be promoted.
    vt = load_mtl(os.path.join(reference_data_dir, "view_test.mtl"))
    assert np.all(vt["red"].ka <= 1.0)


def test_view_test_obj(reference_data_dir):
    meshes = load_obj(os.path.join(reference_data_dir, "view_test.obj"))
    total = sum(len(m.indices) for m in meshes)
    assert total == 4  # 4 triangles, 2 materials
    mats = {m.name.split(":")[1] for m in meshes}
    assert mats == {"red", "blue"}
    # Supplied vn (0,0,1) is used as-is.
    for m in meshes:
        assert np.allclose(m.normals, [[0, 0, 1]] * len(m.normals))


def test_nanosuit_obj(reference_data_dir):
    meshes = load_obj(os.path.join(reference_data_dir, "nanosuit.obj"))
    total = sum(len(m.indices) for m in meshes)
    # 19,058 faces; quads triangulate to more triangles.
    assert total >= 19058
    # Diffuse textures resolve for the suit parts.
    assert any(m.texture_diffuse for m in meshes)


def test_negative_indices_and_fan_triangulation(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n")
    meshes = load_obj(str(obj))
    assert len(meshes) == 1
    assert meshes[0].indices.shape == (2, 3)
    p = meshes[0].positions
    i = meshes[0].indices
    # Fan: (v0, v1, v2), (v0, v2, v3)
    assert np.allclose(p[i[0]], [[0, 0, 0], [1, 0, 0], [1, 1, 0]])
    assert np.allclose(p[i[1]], [[0, 0, 0], [1, 1, 0], [0, 1, 0]])


def test_scene_arrays_from_builtin_cornell(cornell_scene):
    s = cornell_scene
    assert s.n_tris == 36  # 34 in-tree tris + 2 enabled light triangles
    assert s.n_lights == 2
    # Light area: 130 x 105 quad -> each tri 6825 cm^2 (kdtree.cpp:72-77).
    np.testing.assert_allclose(np.asarray(s.light_areas), [6825.0, 6825.0])
    # World AABB padded by 1e-4 (kdtree.cpp:106-107).
    assert np.asarray(s.world_min)[1] == pytest.approx(-1e-4)
    assert np.asarray(s.world_max)[0] == pytest.approx(556.0 + 1e-4)
    # Normals stored as mean of vertex normals (flat here -> unit).
    norms = np.linalg.norm(np.asarray(s.normal), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_scene_arrays_texture_atlas(reference_data_dir):
    meshes = load_obj(os.path.join(reference_data_dir, "nanosuit.obj"))
    scene = build_scene_arrays(meshes)
    n_tex = int(np.asarray(scene.tex_width).shape[0])
    assert n_tex >= 5  # several distinct diffuse maps
    offs = np.asarray(scene.tex_offset)
    ws = np.asarray(scene.tex_width)
    hs = np.asarray(scene.tex_height)
    # Offsets are consistent with packed sizes.
    for i in range(n_tex - 1):
        assert offs[i + 1] == offs[i] + ws[i] * hs[i]
    assert scene.tex_data.shape[0] == offs[-1] + ws[-1] * hs[-1]


def test_bump_maps_decoded_into_atlas(reference_data_dir):
    """Normal maps (`map_bump`) are resolved, decoded, and addressable per
    triangle — parity with the reference, which loads them
    (model.cpp:104-111) but never samples them (SURVEY.md quirk 7)."""
    meshes = load_obj(os.path.join(reference_data_dir, "nanosuit.obj"))
    assert any(m.texture_bump for m in meshes)  # *_ddn.png normal maps
    scene = build_scene_arrays(meshes)
    tid_bump = np.asarray(scene.tex_id_bump)
    assert (tid_bump >= 0).any()
    # Every referenced bump id addresses a real atlas entry distinct from
    # the same mesh's diffuse map.
    tid_kd = np.asarray(scene.tex_id)
    used = tid_bump[tid_bump >= 0]
    assert used.max() < np.asarray(scene.tex_width).shape[0]
    both = (tid_bump >= 0) & (tid_kd >= 0)
    assert (tid_bump[both] != tid_kd[both]).all()
