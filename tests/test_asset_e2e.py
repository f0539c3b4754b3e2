"""End-to-end real-asset-shaped pipeline test.

Builds a .glb the way real exporters do - nested node hierarchy with
TRS transforms, u16 indices, interleaved-free accessors, an embedded PNG
texture referenced through texture/sampler/image indirection, a PBR
material with emissive factor - then runs the FULL pipeline: load ->
finalize -> cluster accel -> progressive render. Mirrors the reference's
actual input class (model_loader.cpp:261-268 + texture.cpp:10-72), which
procedural-scene tests never exercise end to end.
"""

import io
import json
import struct

import numpy as np
import pytest


def _png_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _build_glb(path: str):
    """Textured checker floor + tilted emissive panel, real-exporter shape."""
    # floor quad [0,4]x[0,4] at y=0, uv 0..2 (repeat)
    fpos = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 4], [0, 0, 4]], np.float32)
    fnrm = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    fuv = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], np.float32)
    fidx = np.array([0, 2, 1, 0, 3, 2], np.uint16)
    # unit emissive panel (transformed by node TRS to hover over the floor)
    ppos = np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]],
                    np.float32)
    pnrm = np.tile(np.array([[0, -1, 0]], np.float32), (4, 1))
    puv = np.zeros((4, 2), np.float32)
    pidx = np.array([0, 1, 2, 0, 2, 3], np.uint16)

    checker = ((np.indices((16, 16)).sum(0) % 2) * 200 + 40).astype(np.uint8)
    png = _png_bytes(np.stack([checker, checker // 2, checker], -1))

    chunks = []
    views = []
    accessors = []

    def add(data, target=None, acc=None):
        off = sum(len(c) for c in chunks)
        pad = (-off) % 4
        if pad:
            chunks.append(b"\0" * pad)
            off += pad
        chunks.append(data)
        views.append({"buffer": 0, "byteOffset": off, "byteLength": len(data),
                      **({"target": target} if target else {})})
        vi = len(views) - 1
        if acc:
            acc["bufferView"] = vi
            accessors.append(acc)
            return len(accessors) - 1
        return vi

    def vec_acc(arr, ctype, atype):
        a = {"componentType": ctype, "count": len(arr), "type": atype}
        if atype == "VEC3":
            a["min"] = arr.min(0).tolist()
            a["max"] = arr.max(0).tolist()
        return add(arr.tobytes(), 34962, a)

    f_p = vec_acc(fpos, 5126, "VEC3")
    f_n = vec_acc(fnrm, 5126, "VEC3")
    f_t = vec_acc(fuv, 5126, "VEC2")
    f_i = add(fidx.tobytes(), 34963,
              {"componentType": 5123, "count": len(fidx), "type": "SCALAR"})
    p_p = vec_acc(ppos, 5126, "VEC3")
    p_n = vec_acc(pnrm, 5126, "VEC3")
    p_t = vec_acc(puv, 5126, "VEC2")
    p_i = add(pidx.tobytes(), 34963,
              {"componentType": 5123, "count": len(pidx), "type": "SCALAR"})
    img_view = add(png)

    doc = {
        "asset": {"version": "2.0", "generator": "test-exporter"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        # root (scale) -> [floor, lifted group -> rotated emissive panel]
        "nodes": [
            {"children": [1, 2], "scale": [1.0, 1.0, 1.0]},
            {"mesh": 0},
            {"children": [3], "translation": [2.0, 3.0, 2.0]},
            {"mesh": 1, "rotation": [0.0, 0.3826834, 0.0, 0.9238795]},
        ],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": f_p, "NORMAL": f_n,
                                            "TEXCOORD_0": f_t},
                             "indices": f_i, "material": 0}]},
            {"primitives": [{"attributes": {"POSITION": p_p, "NORMAL": p_n,
                                            "TEXCOORD_0": p_t},
                             "indices": p_i, "material": 1}]},
        ],
        "materials": [
            {"pbrMetallicRoughness": {
                "baseColorTexture": {"index": 0},
                "roughnessFactor": 0.8, "metallicFactor": 0.0}},
            {"pbrMetallicRoughness": {
                "baseColorFactor": [1, 1, 1, 1]},
             "emissiveFactor": [1.0, 1.0, 1.0]},
        ],
        "textures": [{"source": 0, "sampler": 0}],
        "samplers": [{"magFilter": 9729, "wrapS": 10497, "wrapT": 10497}],
        "images": [{"bufferView": img_view, "mimeType": "image/png"}],
        "bufferViews": views,
        "accessors": accessors,
        "buffers": [{"byteLength": sum(len(c) for c in chunks)}],
    }

    bin_chunk = b"".join(chunks)
    bin_chunk += b"\0" * ((-len(bin_chunk)) % 4)
    js = json.dumps(doc).encode()
    js += b" " * ((-len(js)) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_chunk)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A) + js)
        f.write(struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk)


def test_glb_asset_end_to_end(tmp_path):
    pytest.importorskip("PIL")
    from pathtracer.accel.cluster import build_scene_clusters
    from pathtracer.config import RenderConfig
    from pathtracer.integrator.camera import Camera
    from pathtracer.render import render_frame
    from pathtracer.scene.gltf import load_gltf

    p = str(tmp_path / "scene.glb")
    _build_glb(p)
    builder = load_gltf(p)
    scene = build_scene_clusters(builder.finalize())

    assert scene.n_tris == 4
    assert scene.has_textures
    assert scene.has_lights          # emissive panel found by the scan

    cfg = RenderConfig(width=48, height=48, spp=2, max_depth=3, sky="black")
    cam = Camera(position=(2.0, 2.5, 7.0))
    cam.look_at((2.0, 1.0, 2.0))
    img = np.asarray(render_frame(scene, cfg, cam.state(), 0))

    assert np.isfinite(img).all()
    assert img.max() > 0.05, "scene rendered black"
    # the checker texture must produce spatial variance on the lit floor
    floor = img[30:, :, :]
    assert floor.std() > 0.01, "no texture variation visible"


def test_glb_asset_transform_baking(tmp_path):
    """Node TRS chain (translate o rotate) bakes into world-space verts."""
    pytest.importorskip("PIL")
    from pathtracer.scene.gltf import load_gltf

    p = str(tmp_path / "scene.glb")
    _build_glb(p)
    scene = load_gltf(p).finalize()
    pos = np.asarray(scene.positions)
    panel = pos[4:]                       # second mesh's 4 verts
    assert np.allclose(panel[:, 1], 3.0, atol=1e-5)   # lifted by +3
    assert np.allclose(panel.mean(0), [2, 3, 2], atol=1e-5)
    # 45-degree Y rotation: corners land at +-sqrt(2) on one axis
    d = np.abs(panel[:, [0, 2]] - [2, 2])
    assert np.any(d > 1.2), "rotation was not applied"
