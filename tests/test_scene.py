"""Scene builder tests: light extraction + CDF (main.cpp:261-324 semantics)."""

import numpy as np

from pathtracer.scene.build import MaterialDesc, SceneBuilder
from pathtracer.scene import procedural
from pathtracer.scene.types import MAT_DIELECTRIC


def test_emissive_scan_and_cdf():
    b = SceneBuilder()
    dark = b.add_material(MaterialDesc(albedo=(0.5, 0.5, 0.5)))
    # two lights with different power -> CDF weights proportional to lum*area
    l1 = b.add_material(MaterialDesc(albedo=(1, 1, 1), emission=(10, 10, 10)))
    l2 = b.add_material(MaterialDesc(albedo=(1, 1, 1), emission=(10, 10, 10)))

    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2]])
    b.add_mesh(tri, idx, dark)                       # not a light
    b.add_mesh(tri + [0, 0, 1], idx, l1)             # area 0.5
    b.add_mesh((tri * 2) + [0, 0, 2], idx, l2)       # area 2.0 (4x weight)

    s = b.finalize()
    assert s.has_lights and s.n_lights == 2
    pdf = np.asarray(s.light_pdf)
    np.testing.assert_allclose(pdf, [0.2, 0.8], atol=1e-6)
    cdf = np.asarray(s.light_cdf)
    np.testing.assert_allclose(cdf, [0.2, 1.0], atol=1e-6)
    # light emission = mat.emission * mat.albedo (main.cpp:282-284)
    np.testing.assert_allclose(np.asarray(s.light_emission), 10.0)
    # per-tri area pdf: select_prob / area, zero on non-lights
    tl = np.asarray(s.tri_light_pdf_area)
    np.testing.assert_allclose(tl, [0.0, 0.2 / 0.5, 0.8 / 2.0], atol=1e-5)


def test_luminance_threshold():
    """Emission below the 1e-6 luminance cut is not a light (main.cpp:288)."""
    b = SceneBuilder()
    faint = b.add_material(MaterialDesc(albedo=(1, 1, 1),
                                        emission=(1e-7, 1e-7, 1e-7)))
    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    b.add_mesh(tri, np.array([[0, 1, 2]]), faint)
    s = b.finalize()
    assert not s.has_lights


def test_degenerate_tri_not_light():
    """Zero-area emissive triangles are skipped (main.cpp:295)."""
    b = SceneBuilder()
    lm = b.add_material(MaterialDesc(albedo=(1, 1, 1), emission=(5, 5, 5)))
    tri = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32)  # colinear
    b.add_mesh(tri, np.array([[0, 1, 2]]), lm)
    s = b.finalize()
    assert not s.has_lights


def test_material_defaults_match_reference():
    """model_loader.cpp:167-177 base material defaults."""
    m = MaterialDesc()
    assert m.albedo == (0.8, 0.8, 0.8)
    assert m.roughness == 1.0 and m.metallic == 0.0
    assert m.ior == 1.5 and m.alpha == 1.0
    assert m.albedo_tex == -1 and m.mr_tex == -1 and m.normal_tex == -1


def test_transform_baking():
    """World-space baking at add time (model_loader.cpp:148-155)."""
    b = SceneBuilder()
    mat = b.add_material(MaterialDesc())
    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.array([[0, 0, 1]] * 3, np.float32)
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [5, 0, 0]
    t[0, 0] = 2.0  # non-uniform scale: normals need inverse-transpose
    b.add_mesh(tri, np.array([[0, 1, 2]]), mat, normals=nrm, transform=t)
    s = b.finalize()
    p = np.asarray(s.positions)
    np.testing.assert_allclose(p[0], [5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(p[1], [7, 0, 0], atol=1e-6)
    n = np.asarray(s.normals)
    np.testing.assert_allclose(n[0], [0, 0, 1], atol=1e-6)


def test_vertex_normal_generation():
    b = SceneBuilder()
    mat = b.add_material(MaterialDesc())
    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    b.add_mesh(tri, np.array([[0, 1, 2]]), mat)  # no normals given
    s = b.finalize()
    np.testing.assert_allclose(np.asarray(s.normals),
                               [[0, 0, 1]] * 3, atol=1e-6)


def test_cornell_box_structure():
    s = procedural.cornell_box().finalize()
    assert s.n_tris == 12
    assert s.n_lights == 2
    assert s.has_lights


def test_cornell_materials_suite():
    s = procedural.cornell_box(materials_suite=True).finalize()
    types = np.asarray(s.mat_type)
    assert (types == MAT_DIELECTRIC).sum() == 1
    assert s.n_tris > 1000  # spheres tessellated


def test_sponza_like_tri_count():
    s = procedural.sponza_like(target_tris=50_000).finalize()
    assert 35_000 < s.n_tris < 80_000
    assert s.has_lights


def test_stochastic_texture_filter_matches_bilinear_in_expectation():
    """1-tap jittered sampling must average to the 4-tap bilinear value.

    P(pick x0+1) = frac(x) by construction (path._sample_texture with
    tex_u), so the mean over many uniforms converges to the bilinear
    kernel - the unbiasedness contract that lets the renderer default to
    stochastic_texture_filtering=True.
    """
    import jax.numpy as jnp
    import numpy as np

    from pathtracer.integrator.path import _sample_texture

    rng = np.random.default_rng(3)
    tex = rng.random((1, 8, 8, 4)).astype(np.float32)
    tex_u8 = jnp.asarray((tex * 255).round().astype(np.uint8))
    wh = jnp.array([[8, 8]], jnp.int32)
    n = 16
    tid = jnp.zeros((n,), jnp.int32)
    u = jnp.asarray(rng.random(n, dtype=np.float32))
    v = jnp.asarray(rng.random(n, dtype=np.float32))

    exact = _sample_texture(tex_u8, wh, tid, u, v)
    m = 4000
    acc = np.zeros((n, 4), np.float32)
    for i in range(m):
        ux = jnp.asarray(rng.random(n, dtype=np.float32))
        uy = jnp.asarray(rng.random(n, dtype=np.float32))
        acc += np.asarray(_sample_texture(tex_u8, wh, tid, u, v, (ux, uy)))
    err = np.abs(acc / m - np.asarray(exact)).max()
    assert err < 0.02, f"stochastic filter biased: max err {err:.4f}"


def test_composite_texels_match_per_texture_path():
    """The one-gather composite path must reproduce the 3-tap stochastic
    path exactly when all of a material's maps share dims (no build-time
    resampling), since both decode the same u8 quantization."""
    import dataclasses as dc

    import jax.numpy as jnp
    import numpy as np

    from pathtracer.integrator.path import fetch_surface, pack_surface_rows
    from pathtracer.kernels.intersect import Hit
    from pathtracer.scene.build import MaterialDesc, SceneBuilder

    rng = np.random.default_rng(5)
    b = SceneBuilder()
    a_t = b.add_texture(rng.random((16, 16, 4)).astype(np.float32))
    m_t = b.add_texture(rng.random((16, 16, 4)).astype(np.float32))
    n_t = b.add_texture(
        np.concatenate([rng.random((16, 16, 3)).astype(np.float32) * 0.4
                        + 0.3, np.ones((16, 16, 1), np.float32)], -1))
    mat = b.add_material(MaterialDesc(albedo=(1, 1, 1), albedo_tex=a_t,
                                      mr_tex=m_t, normal_tex=n_t,
                                      roughness=0.5, metallic=0.5))
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    b.add_mesh(verts, np.array([[0, 1, 2]]), mat,
               uvs=rng.random((3, 2)).astype(np.float32),
               tangents=np.tile([[1, 0, 0]], (3, 1)).astype(np.float32))
    scene = b.finalize()
    assert scene.tex_comp is not None

    n = 64
    hit = Hit(t=jnp.ones((n,)), tri=jnp.zeros((n,), jnp.int32),
              u=jnp.asarray(rng.random(n, dtype=np.float32) * 0.5),
              v=jnp.asarray(rng.random(n, dtype=np.float32) * 0.5))
    o = jnp.zeros((n, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    tex_u = (jnp.asarray(rng.random(n, dtype=np.float32)),
             jnp.asarray(rng.random(n, dtype=np.float32)))
    rows = pack_surface_rows(scene)

    s_comp = fetch_surface(scene, rows, hit, o, d, False, tex_u)
    scene_nc = dc.replace(scene, tex_comp=None, tex_comp_wh=None)
    s_tex = fetch_surface(scene_nc, rows, hit, o, d, False, tex_u)

    np.testing.assert_array_equal(np.asarray(s_comp.albedo),
                                  np.asarray(s_tex.albedo))
    np.testing.assert_array_equal(np.asarray(s_comp.alpha),
                                  np.asarray(s_tex.alpha))
    np.testing.assert_array_equal(np.asarray(s_comp.roughness),
                                  np.asarray(s_tex.roughness))
    np.testing.assert_array_equal(np.asarray(s_comp.metallic),
                                  np.asarray(s_tex.metallic))
    np.testing.assert_allclose(np.asarray(s_comp.normal),
                               np.asarray(s_tex.normal), atol=1e-6)
