"""glTF + OBJ loader tests (model_loader.cpp parity semantics)."""

import base64
import json
import os
import struct

import numpy as np
import pytest

from pathtracer.scene.gltf import load_gltf
from pathtracer.scene.objload import load_obj
from pathtracer.scene.types import MAT_DIELECTRIC


def _tri_gltf(tmp_path, *, matrix=None, trs=None, material=None,
              binary=False):
    """Build a one-triangle glTF file on disk and return its path."""
    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    normals = np.array([[0, 0, 1]] * 3, np.float32)
    indices = np.array([0, 1, 2], np.uint16)

    pos_b = positions.tobytes()
    nrm_b = normals.tobytes()
    idx_b = indices.tobytes() + b"\x00\x00"  # pad to 4
    blob = pos_b + nrm_b + idx_b

    node = {"mesh": 0}
    if matrix is not None:
        node["matrix"] = matrix
    if trs is not None:
        node.update(trs)

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [node],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1},
            "indices": 2,
            **({"material": 0} if material is not None else {}),
        }]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_b)},
            {"buffer": 0, "byteOffset": len(pos_b), "byteLength": len(nrm_b)},
            {"buffer": 0, "byteOffset": len(pos_b) + len(nrm_b),
             "byteLength": len(idx_b)},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    if material is not None:
        doc["materials"] = [material]

    if binary:
        js = json.dumps(doc).encode()
        js += b" " * ((-len(js)) % 4)
        blob_p = blob + b"\x00" * ((-len(blob)) % 4)
        out = b"glTF" + struct.pack("<II", 2, 12 + 8 + len(js) + 8 + len(blob_p))
        out += struct.pack("<II", len(js), 0x4E4F534A) + js
        out += struct.pack("<II", len(blob_p), 0x004E4942) + blob_p
        p = os.path.join(tmp_path, "tri.glb")
        with open(p, "wb") as f:
            f.write(out)
    else:
        doc["buffers"][0]["uri"] = (
            "data:application/octet-stream;base64,"
            + base64.b64encode(blob).decode())
        p = os.path.join(tmp_path, "tri.gltf")
        with open(p, "w") as f:
            json.dump(doc, f)
    return p


def test_gltf_basic_ascii(tmp_path):
    s = load_gltf(_tri_gltf(tmp_path)).finalize()
    assert s.n_tris == 1
    np.testing.assert_allclose(
        np.asarray(s.positions), [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
        atol=1e-6)


def test_gltf_glb_binary(tmp_path):
    """Binary .glb works (the reference is ASCII-only, SURVEY.md par.3.6.9)."""
    s = load_gltf(_tri_gltf(tmp_path, binary=True)).finalize()
    assert s.n_tris == 1


def test_gltf_node_matrix_baking(tmp_path):
    """glTF column-major matrix is transposed + baked (model_loader.cpp:74)."""
    # translate by (5, 0, 0): column-major => translation in elements 12-14
    m = [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 5, 0, 0, 1]
    s = load_gltf(_tri_gltf(tmp_path, matrix=m)).finalize()
    np.testing.assert_allclose(np.asarray(s.positions)[0], [5, 0, 0],
                               atol=1e-6)


def test_gltf_trs_composition(tmp_path):
    """T * R * S order (model_loader.cpp:39-52)."""
    trs = {"translation": [0, 0, 2], "scale": [2, 2, 2]}
    s = load_gltf(_tri_gltf(tmp_path, trs=trs)).finalize()
    p = np.asarray(s.positions)
    np.testing.assert_allclose(p[1], [2, 0, 2], atol=1e-6)  # scaled then moved


def test_gltf_material_extraction(tmp_path):
    mat = {
        "pbrMetallicRoughness": {
            "baseColorFactor": [0.9, 0.1, 0.2, 0.8],
            "metallicFactor": 0.7,
            "roughnessFactor": 0.3,
        },
        "emissiveFactor": [1.0, 2.0, 3.0],
        "extensions": {"KHR_materials_ior": {"ior": 1.33}},
    }
    s = load_gltf(_tri_gltf(tmp_path, material=mat)).finalize()
    np.testing.assert_allclose(np.asarray(s.mat_albedo)[0], [0.9, 0.1, 0.2],
                               atol=1e-6)
    assert abs(float(s.mat_alpha[0]) - 0.8) < 1e-6
    assert abs(float(s.mat_metallic[0]) - 0.7) < 1e-6
    assert abs(float(s.mat_roughness[0]) - 0.3) < 1e-6
    assert abs(float(s.mat_ior[0]) - 1.33) < 1e-6
    np.testing.assert_allclose(np.asarray(s.mat_emission)[0], [1, 2, 3],
                               atol=1e-6)


def test_gltf_sparse_accessor(tmp_path):
    """Sparse POSITION override honors sparse.count + componentTypes."""
    base = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    sp_idx = np.array([2], np.uint16)
    sp_val = np.array([[0, 2, 0]], np.float32)
    # trailing garbage after the sparse values: the loader must stop at
    # sparse.count, not read to end-of-buffer
    junk = np.full(6, 7.5, np.float32)
    blob = (base.tobytes() + idx.tobytes() + b"\x00\x00"
            + sp_idx.tobytes() + b"\x00\x00" + sp_val.tobytes()
            + junk.tobytes())
    off_idx = len(base.tobytes())
    off_spi = off_idx + 8
    off_spv = off_spi + 4
    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}], "scene": 0,
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "indices": 1}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3",
             "sparse": {
                 "count": 1,
                 "indices": {"bufferView": 2, "componentType": 5123},
                 "values": {"bufferView": 3},
             }},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": off_idx, "byteLength": 6},
            {"buffer": 0, "byteOffset": off_spi, "byteLength": 2},
            {"buffer": 0, "byteOffset": off_spv, "byteLength": 12},
        ],
        "buffers": [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode(),
        }],
    }
    p = os.path.join(tmp_path, "sparse.gltf")
    with open(p, "w") as f:
        json.dump(doc, f)
    s = load_gltf(p).finalize()
    got = np.asarray(s.positions)
    np.testing.assert_allclose(got[2], [0, 2, 0], atol=1e-6)
    np.testing.assert_allclose(got[0], [0, 0, 0], atol=1e-6)


OBJ_SAMPLE = """
# simple two-material square + extra tri
mtllib mats.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vn 0 0 1
vt 0 0
vt 1 0
vt 1 1
usemtl red
f 1/1/1 2/2/1 3/3/1
f 1/1/1 3/3/1 4/1/1
usemtl glass
f 1 2 5
"""

MTL_SAMPLE = """
newmtl red
Kd 0.8 0.1 0.1
Ke 0 0 0
Ns 250
newmtl glass
Kd 1 1 1
Ni 1.5
illum 7
"""


def test_obj_loader(tmp_path):
    objp = os.path.join(tmp_path, "scene.obj")
    with open(objp, "w") as f:
        f.write(OBJ_SAMPLE)
    with open(os.path.join(tmp_path, "mats.mtl"), "w") as f:
        f.write(MTL_SAMPLE)
    s = load_obj(objp).finalize()
    assert s.n_tris == 3
    albedos = np.asarray(s.mat_albedo)
    assert any(np.allclose(a, [0.8, 0.1, 0.1]) for a in albedos)
    types = np.asarray(s.mat_type)
    assert (types == MAT_DIELECTRIC).sum() == 1
    iors = np.asarray(s.mat_ior)[types == MAT_DIELECTRIC]
    np.testing.assert_allclose(iors, 1.5)


def test_obj_negative_indices(tmp_path):
    objp = os.path.join(tmp_path, "neg.obj")
    with open(objp, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    s = load_obj(objp).finalize()
    assert s.n_tris == 1


def test_obj_quad_fan(tmp_path):
    objp = os.path.join(tmp_path, "quad.obj")
    with open(objp, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    s = load_obj(objp).finalize()
    assert s.n_tris == 2
