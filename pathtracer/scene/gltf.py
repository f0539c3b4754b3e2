"""glTF 2.0 loader (pure python + PIL) -> SceneBuilder.

Re-derivation of render/model_loader.cpp on top of the raw glTF spec
instead of tinygltf (SURVEY.md par.2.2). Behavioral parity points:

- recursive node walk with TRS-or-matrix composition
  (model_loader.cpp:20-56, 74-75; glTF matrices are column-major);
- world-space baking of positions (matrix), normals (inverse-transpose),
  tangents (3x3) at load time (model_loader.cpp:148-155);
- POSITION/NORMAL/TANGENT/TEXCOORD_0 attributes, u8/u16/u32 indices
  (model_loader.cpp:95-138; we add u8 and non-indexed primitives);
- PBR metallic-roughness extraction: baseColorFactor (rgb + alpha),
  emissiveFactor, three texture slots, KHR_materials_ior
  (model_loader.cpp:166-234); defaults per model_loader.cpp:167-177;
- texture deduplication by source image (model_loader.cpp:196-219).

Upgrades over the reference: binary .glb and embedded base64 buffers are
supported (the reference is ASCII-only - SURVEY.md par.3.6.9), and
metallic/roughness factors default to the glTF-spec 1.0 when a material
defines pbrMetallicRoughness (the reference leaves its 1.0/0.0 defaults).
"""

from __future__ import annotations

import base64
import json
import os
import struct
from typing import Dict, Optional

import numpy as np

from pathtracer.scene.build import MaterialDesc, SceneBuilder
from pathtracer.scene.types import MAT_DIELECTRIC

_COMPONENT_DTYPE = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16, 5123: np.uint16,
    5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNT = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
               "MAT3": 9, "MAT4": 16}


def _normalize_int(arr: np.ndarray) -> np.ndarray:
    """glTF integer normalization: x/max, clamped at -1 for signed types
    (int8 -128 would otherwise give -1.0079; matches the native unpack,
    native/pathtracer_native.cpp pt_accessor_to_f32)."""
    info = np.iinfo(arr.dtype)
    out = arr.astype(np.float32) / float(info.max)
    if info.min < 0:
        out = np.maximum(out, -1.0)
    return out


class _Gltf:
    def __init__(self, path: str):
        self.dir = os.path.dirname(os.path.abspath(path))
        self.glb_bin: Optional[bytes] = None
        with open(path, "rb") as f:
            head = f.read(4)
            f.seek(0)
            if head == b"glTF":  # GLB container
                data = f.read()
                magic, version, length = struct.unpack_from("<III", data, 0)
                off = 12
                doc = None
                while off < length:
                    clen, ctype = struct.unpack_from("<II", data, off)
                    chunk = data[off + 8: off + 8 + clen]
                    if ctype == 0x4E4F534A:  # 'JSON'
                        doc = json.loads(chunk)
                    elif ctype == 0x004E4942:  # 'BIN'
                        self.glb_bin = chunk
                    off += 8 + clen + (-clen % 4 if False else 0)
                    # chunks are 4-byte aligned with padded length
                    off += (-clen) % 4
                self.doc = doc
            else:
                self.doc = json.load(open(path, "r"))
        self._buffers: Dict[int, bytes] = {}

    def buffer(self, i: int) -> bytes:
        if i not in self._buffers:
            b = self.doc["buffers"][i]
            uri = b.get("uri")
            if uri is None:
                data = self.glb_bin
            elif uri.startswith("data:"):
                data = base64.b64decode(uri.split(",", 1)[1])
            else:
                from urllib.parse import unquote

                with open(os.path.join(self.dir, unquote(uri)), "rb") as f:
                    data = f.read()
            self._buffers[i] = data
        return self._buffers[i]

    def accessor(self, i: int) -> np.ndarray:
        acc = self.doc["accessors"][i]
        n = acc["count"]
        ncomp = _TYPE_COUNT[acc["type"]]
        dtype = _COMPONENT_DTYPE[acc["componentType"]]
        itemsize = np.dtype(dtype).itemsize * ncomp
        if "bufferView" not in acc:
            out = np.zeros((n, ncomp), dtype)
        else:
            bv = self.doc["bufferViews"][acc["bufferView"]]
            data = self.buffer(bv["buffer"])
            start = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
            stride = bv.get("byteStride") or itemsize
            # native strided unpack (C++ hot path, utils/native.py);
            # falls through to numpy when the toolchain is unavailable
            out = None
            if not acc.get("sparse"):
                from pathtracer.utils import native

                if dtype == np.float32 or acc.get("normalized") or \
                        np.issubdtype(dtype, np.floating):
                    out = native.accessor_to_f32(
                        data, start, n, ncomp, acc["componentType"],
                        0 if stride == itemsize else stride,
                        bool(acc.get("normalized")))
            if out is not None:
                return out
            if stride == itemsize:
                out = np.frombuffer(
                    data, dtype, count=n * ncomp, offset=start
                ).reshape(n, ncomp).copy()
            else:
                raw = np.frombuffer(data, np.uint8)
                rows = np.stack([
                    raw[start + k * stride: start + k * stride + itemsize]
                    for k in range(n)])
                out = rows.view(dtype).reshape(n, ncomp)
        if acc.get("normalized") and np.issubdtype(dtype, np.integer):
            out = _normalize_int(out)
        # sparse accessor substitution (indices/values carry their own
        # componentType / the accessor's; both honor sparse.count)
        sp = acc.get("sparse")
        if sp:
            sc = int(sp["count"])
            idx = self._sparse_array(
                sp["indices"], sc, 1,
                sp["indices"]["componentType"]).reshape(-1).astype(np.int64)
            vals = self._sparse_array(
                sp["values"], sc, ncomp, acc["componentType"])
            if acc.get("normalized") and np.issubdtype(dtype, np.integer):
                vals = _normalize_int(vals)
            out = out.copy()
            out[idx] = vals
        return out

    def _sparse_array(self, ref, count, ncomp, component_type):
        bv = self.doc["bufferViews"][ref["bufferView"]]
        data = self.buffer(bv["buffer"])
        start = bv.get("byteOffset", 0) + ref.get("byteOffset", 0)
        dtype = _COMPONENT_DTYPE[component_type]
        arr = np.frombuffer(data, dtype, count=count * ncomp, offset=start)
        return arr.reshape(count, ncomp) if ncomp > 1 else arr.copy()

    def image_rgba(self, image_index: int) -> np.ndarray:
        img = self.doc["images"][image_index]
        if "uri" in img and not img["uri"].startswith("data:"):
            from urllib.parse import unquote

            with open(os.path.join(self.dir, unquote(img["uri"])),
                      "rb") as f:
                raw = f.read()
        elif "uri" in img:
            raw = base64.b64decode(img["uri"].split(",", 1)[1])
        else:
            bv = self.doc["bufferViews"][img["bufferView"]]
            data = self.buffer(bv["buffer"])
            start = bv.get("byteOffset", 0)
            raw = data[start: start + bv["byteLength"]]

        # native PNG decoder first (the stb_image role, texture.cpp:5-13)
        from pathtracer.utils import native

        arr = native.png_decode(raw)
        if arr is not None:
            if arr.shape[2] == 4:
                return arr
            rgba = np.empty(arr.shape[:2] + (4,), np.uint8)
            if arr.shape[2] == 1:
                rgba[..., :3] = arr
            elif arr.shape[2] == 2:       # gray + alpha
                rgba[..., :3] = arr[..., :1]
                rgba[..., 3] = arr[..., 1]
                return rgba
            else:
                rgba[..., :3] = arr
            rgba[..., 3] = 255
            return rgba

        from io import BytesIO

        from PIL import Image

        return np.asarray(Image.open(BytesIO(raw)).convert("RGBA"))


def _node_matrix(node: dict) -> np.ndarray:
    """Local transform: `matrix` or TRS compose (model_loader.cpp:20-56)."""
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    if "scale" in node:
        m = m @ np.diag(list(node["scale"]) + [1.0]).astype(np.float32)
    if "rotation" in node:
        x, y, z, w = node["rotation"]
        r = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w), 0],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w), 0],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y), 0],
            [0, 0, 0, 1]], np.float32)
        m = r @ m
    if "translation" in node:
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = node["translation"]
        m = t @ m
    return m


def load_gltf(path: str, builder: Optional[SceneBuilder] = None,
              transform=None) -> SceneBuilder:
    """Load a .gltf/.glb file into a SceneBuilder (created if not given)."""
    g = _Gltf(path)
    b = builder or SceneBuilder()
    doc = g.doc

    tex_cache: Dict[int, int] = {}     # glTF image index -> builder tex id
    mat_cache: Dict[int, int] = {}     # glTF material index -> builder id

    def get_texture(tex_info) -> int:
        if tex_info is None or tex_info.get("index", -1) < 0:
            return -1
        tex = doc["textures"][tex_info["index"]]
        src = tex.get("source", -1)
        if src < 0:
            return -1
        if src not in tex_cache:             # dedup (model_loader.cpp:201)
            tex_cache[src] = b.add_texture(g.image_rgba(src))
        return tex_cache[src]

    def get_material(mi: int) -> int:
        if mi < 0:
            if -1 not in mat_cache:
                mat_cache[-1] = b.add_material(MaterialDesc())
            return mat_cache[-1]
        if mi in mat_cache:
            return mat_cache[mi]
        m = doc["materials"][mi]
        pbr = m.get("pbrMetallicRoughness", {})
        desc = MaterialDesc()
        bcf = pbr.get("baseColorFactor", [1, 1, 1, 1])
        if "pbrMetallicRoughness" in m or "baseColorFactor" in pbr:
            desc.albedo = tuple(bcf[:3])
            if len(bcf) == 4:
                desc.alpha = float(bcf[3])
            desc.metallic = float(pbr.get("metallicFactor", 1.0))
            desc.roughness = float(pbr.get("roughnessFactor", 1.0))
        ef = m.get("emissiveFactor")
        if ef:
            desc.emission = tuple(ef)
        desc.albedo_tex = get_texture(pbr.get("baseColorTexture"))
        desc.mr_tex = get_texture(pbr.get("metallicRoughnessTexture"))
        desc.normal_tex = get_texture(m.get("normalTexture"))
        exts = m.get("extensions", {})
        ext = exts.get("KHR_materials_ior")
        if ext and "ior" in ext:                 # model_loader.cpp:225-228
            desc.ior = float(ext["ior"])
        ext = exts.get("KHR_materials_emissive_strength")
        if ext and "emissiveStrength" in ext:
            # radiance > 1 rides the extension; emissiveFactor is its hue
            s = float(ext["emissiveStrength"])
            desc.emission = tuple(s * c for c in desc.emission)
        ext = exts.get("KHR_materials_transmission")
        if ext and float(ext.get("transmissionFactor", 0.0)) >= 0.5:
            # The renderer has no partial-transmission blend; promote to
            # the dielectric BSDF only when the asset is mostly
            # transmissive (export_glb writes factor=1.0). A small factor
            # (e.g. 0.1 "slightly translucent") stays on the base PBR
            # material - closer than rendering it as pure glass.
            desc.material_type = MAT_DIELECTRIC
        mat_cache[mi] = b.add_material(desc)
        return mat_cache[mi]

    def process_node(ni: int, parent: np.ndarray):
        node = doc["nodes"][ni]
        world = parent @ _node_matrix(node)
        if "mesh" in node:
            mesh = doc["meshes"][node["mesh"]]
            for prim in mesh.get("primitives", []):
                if prim.get("mode", 4) != 4:     # triangles only
                    continue
                attrs = prim["attributes"]
                pos = g.accessor(attrs["POSITION"]).astype(np.float32)
                nrm = (g.accessor(attrs["NORMAL"]).astype(np.float32)
                       if "NORMAL" in attrs else None)
                uv = (g.accessor(attrs["TEXCOORD_0"]).astype(np.float32)
                      if "TEXCOORD_0" in attrs else None)
                tan = (g.accessor(attrs["TANGENT"]).astype(np.float32)
                       if "TANGENT" in attrs else None)
                if "indices" in prim:
                    idx = g.accessor(prim["indices"]).reshape(-1)
                else:
                    idx = np.arange(len(pos))
                idx = idx.astype(np.int64).reshape(-1, 3)
                mat = get_material(prim.get("material", -1))
                b.add_mesh(pos, idx, mat, normals=nrm, uvs=uv, tangents=tan,
                           transform=world)
        for child in node.get("children", []):
            process_node(child, world)

    root = np.eye(4, dtype=np.float32)
    if transform is not None:
        root = np.asarray(transform, np.float32).reshape(4, 4)
    scene_idx = doc.get("scene", 0)
    scenes = doc.get("scenes", [{"nodes": list(range(len(doc.get("nodes", []))))}])
    for ni in scenes[scene_idx].get("nodes", []):
        process_node(ni, root)
    return b
