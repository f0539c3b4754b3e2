"""glTF .glb exporter roundtrip: export_glb then load_gltf == identity.

The exporter (scene/export.py) writes the asset class the reference
consumes from disk (main.cpp:30-41: glTF scenes with PNG textures); these
tests pin that a built scene survives the disk round trip — geometry
bit-exact, u8 texture stack bit-exact, materials field-exact including
the KHR_materials_{ior,transmission,emissive_strength} extensions.
"""

import numpy as np

from pathtracer.scene.build import MaterialDesc, SceneBuilder
from pathtracer.scene.export import export_glb
from pathtracer.scene.gltf import load_gltf
from pathtracer.scene.procedural import sponza_like
from pathtracer.scene.types import MAT_DIELECTRIC


def _np(scene, name):
    return np.asarray(getattr(scene, name))


def _per_face(scene, name):
    """Material field resolved per face — invariant to the material-id
    renumbering the loader's first-use-order cache applies."""
    fm = _np(scene, "face_material")
    return _np(scene, name)[fm]


def _roundtrip(builder, tmp_path):
    path = str(tmp_path / "rt.glb")
    export_glb(builder, path)
    return load_gltf(path).finalize()


def test_sponza_textured_roundtrip(tmp_path):
    orig = sponza_like(target_tris=3_000, textured=True).finalize()
    back = _roundtrip(sponza_like(target_tris=3_000, textured=True),
                      tmp_path)

    for name in ("positions", "normals", "uvs", "tangents", "indices"):
        np.testing.assert_array_equal(_np(orig, name), _np(back, name),
                                      err_msg=name)
    for name in ("mat_albedo", "mat_roughness", "mat_metallic", "mat_ior",
                 "mat_alpha", "mat_type"):
        np.testing.assert_array_equal(_per_face(orig, name),
                                      _per_face(back, name), err_msg=name)
    np.testing.assert_allclose(_per_face(orig, "mat_emission"),
                               _per_face(back, "mat_emission"),
                               rtol=1e-6, err_msg="mat_emission")

    # texture stack: same u8 quantization on both paths -> bit-exact,
    # modulo the loader's first-use texture renumbering
    oa, ba = _per_face(orig, "mat_albedo_tex"), _per_face(back,
                                                          "mat_albedo_tex")
    assert ((oa >= 0) == (ba >= 0)).all()
    otex, btex = _np(orig, "textures"), _np(back, "textures")
    owh, bwh = _np(orig, "tex_wh"), _np(back, "tex_wh")
    for field in ("mat_albedo_tex", "mat_mr_tex", "mat_normal_tex"):
        of, bf = _per_face(orig, field), _per_face(back, field)
        for o, b in set(zip(of.tolist(), bf.tolist())):
            assert (o >= 0) == (b >= 0), field
            if o >= 0:
                np.testing.assert_array_equal(owh[o], bwh[b])
                np.testing.assert_array_equal(otex[o], btex[b],
                                              err_msg=f"{field} texels")

    # lights extract identically (same face order, same emission)
    assert orig.n_lights == back.n_lights
    np.testing.assert_allclose(_np(orig, "light_cdf"),
                               _np(back, "light_cdf"), rtol=1e-6)


def test_extension_materials_roundtrip(tmp_path):
    b = SceneBuilder()
    glass = b.add_material(MaterialDesc(
        albedo=(1.0, 0.9, 0.9), material_type=MAT_DIELECTRIC, ior=1.33,
        roughness=0.05))
    shiny = b.add_material(MaterialDesc(
        albedo=(0.9, 0.6, 0.2), metallic=0.7, roughness=0.3, alpha=0.5))
    lamp = b.add_material(MaterialDesc(
        albedo=(1, 1, 1), emission=(12.0, 6.0, 3.0)))  # needs strength ext
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tri = np.array([[0, 1, 2]], np.int64)
    b.add_mesh(v[:3], tri, glass)
    b.add_mesh(v[1:], tri, shiny)
    b.add_mesh(v[[0, 2, 3]], tri, lamp)

    back = _roundtrip(b, tmp_path)
    assert _per_face(back, "mat_type").tolist() == [MAT_DIELECTRIC, 0, 0]
    np.testing.assert_allclose(_per_face(back, "mat_ior"),
                               [1.33, 1.5, 1.5], rtol=1e-6)
    np.testing.assert_allclose(_per_face(back, "mat_metallic"),
                               [0.0, 0.7, 0.0], rtol=1e-6)
    np.testing.assert_allclose(_per_face(back, "mat_alpha"),
                               [1.0, 0.5, 1.0], rtol=1e-6)
    np.testing.assert_allclose(_per_face(back, "mat_emission")[2],
                               [12.0, 6.0, 3.0], rtol=1e-6)


def test_tangent_handedness_roundtrip(tmp_path):
    """A loaded asset with w=-1 tangents (mirrored UVs) re-exports with
    the sign preserved (ADVICE r2: builder used to drop w at add_mesh)."""
    b = SceneBuilder()
    mat = b.add_material(MaterialDesc())
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tri = np.array([[0, 1, 2]], np.int64)
    tan4 = np.array([[1, 0, 0, -1], [1, 0, 0, -1], [0, 1, 0, 1]],
                    np.float32)
    b.add_mesh(v, tri, mat, tangents=tan4)
    np.testing.assert_array_equal(b._tangent_w[0], [-1, -1, 1])

    path = str(tmp_path / "w.glb")
    export_glb(b, path)
    back = load_gltf(path)
    np.testing.assert_array_equal(back._tangent_w[0], [-1, -1, 1])
    np.testing.assert_array_equal(np.asarray(back._tangents[0]),
                                  tan4[:, :3])


def test_partial_transmission_not_promoted(tmp_path):
    """transmissionFactor < 0.5 must NOT turn the material into glass
    (ADVICE r2: a 0.1-translucent asset rendered as pure dielectric)."""
    import json
    import struct

    b = SceneBuilder()
    mat = b.add_material(MaterialDesc(material_type=MAT_DIELECTRIC))
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    b.add_mesh(v, np.array([[0, 1, 2]], np.int64), mat)
    path = str(tmp_path / "t.glb")
    export_glb(b, path)
    # patch the exporter's transmissionFactor 1.0 -> 0.1 in the JSON chunk
    raw = bytearray(open(path, "rb").read())
    jlen = struct.unpack_from("<I", raw, 12)[0]
    js = json.loads(raw[20:20 + jlen])
    ext = js["materials"][0]["extensions"]["KHR_materials_transmission"]
    assert ext["transmissionFactor"] == 1.0
    ext["transmissionFactor"] = 0.1
    enc = json.dumps(js, separators=(",", ":")).encode()
    enc += b" " * ((-len(enc)) % 4)
    body = bytes(raw[20 + jlen:])
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(enc)
                            + len(body)))
        f.write(struct.pack("<II", len(enc), 0x4E4F534A) + enc)
        f.write(body)
    back = load_gltf(path).finalize()
    assert _per_face(back, "mat_type").tolist() == [0]   # not dielectric


def test_export_rejects_empty_mesh():
    b = SceneBuilder()
    mat = b.add_material(MaterialDesc())
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    n = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
    b.add_mesh(v, np.zeros((0, 3), np.int64), mat, normals=n)
    import pytest

    with pytest.raises(ValueError, match="no triangles"):
        export_glb(b, "/tmp/unused.glb")


def test_exported_asset_renders_identically(tmp_path):
    """Full pipeline: export -> disk -> load -> accel -> render matches a
    direct in-memory build of the same scene (the from-disk asset path
    costs nothing in fidelity)."""
    import jax

    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.config import RenderConfig
    from pathtracer.integrator.camera import Camera
    from pathtracer.render import render_frame

    cfg = RenderConfig(width=16, height=16, spp=2, max_depth=3,
                       intersector="cluster")
    cam = Camera(position=(3.0, 4.5, 6.0))
    cam.look_at((14.0, 3.0, 6.0))

    def render(scene):
        scene = build_scene_clusters(scene)
        img = render_frame(scene, cfg, cam.state(), 0)
        return np.asarray(jax.block_until_ready(img))

    direct = render(sponza_like(target_tris=2_000, textured=True).finalize())
    viadisk = render(_roundtrip(
        sponza_like(target_tris=2_000, textured=True), tmp_path))
    np.testing.assert_allclose(direct, viadisk, atol=1e-5)
