"""glTF loader, CAD gate, picking/autofocus, viewer internals."""
import base64
import json
import struct

import jax.numpy as jnp
import numpy as np
import pytest

from cadrays_tpu.geometry import primitives
from cadrays_tpu.geometry.loaders.gltf import load_gltf


def _make_gltf(tmp_path, binary=False):
    """Two-triangle quad with normals/uvs + a red material + a child node
    with a translation."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.float32([0, 0, 1]), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    bin_data = (pos.tobytes() + nrm.tobytes() + uv.tobytes() + idx.tobytes())
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [2.0, 0.0, 0.0]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [{"name": "red", "pbrMetallicRoughness": {
            "baseColorFactor": [1.0, 0.0, 0.0, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 0.5}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
        ],
        "buffers": [{"byteLength": len(bin_data)}],
    }
    if binary:
        path = str(tmp_path / "t.glb")
        js = json.dumps(doc).encode()
        js += b" " * (-len(js) % 4)
        bd = bin_data + b"\x00" * (-len(bin_data) % 4)
        with open(path, "wb") as f:
            total = 12 + 8 + len(js) + 8 + len(bd)
            f.write(struct.pack("<III", 0x46546C67, 2, total))
            f.write(struct.pack("<II", len(js), 0x4E4F534A))
            f.write(js)
            f.write(struct.pack("<II", len(bd), 0x004E4942))
            f.write(bd)
    else:
        doc["buffers"][0]["uri"] = (
            "data:application/octet-stream;base64,"
            + base64.b64encode(bin_data).decode())
        path = str(tmp_path / "t.gltf")
        with open(path, "w") as f:
            json.dump(doc, f)
    return path


class TestGltf:
    @pytest.mark.parametrize("binary", [False, True])
    def test_load(self, tmp_path, binary):
        path = _make_gltf(tmp_path, binary)
        parts = load_gltf(path)
        assert len(parts) == 1
        p = parts[0]
        assert p.mesh.num_triangles == 2
        assert p.material_name == "red"
        assert p.diffuse == (1.0, 0.0, 0.0)
        # node translation baked
        assert p.mesh.vertices[:, 0].min() >= 2.0
        assert p.mesh.uvs is not None

    def test_rtmeshread_gltf(self, tmp_path):
        from cadrays_tpu.cli.commands import Console, Session

        path = _make_gltf(tmp_path, binary=True)
        c = Console(Session())
        out = c.exec(f"rtmeshread {path}")
        node = c.session.scene.model.get(out.split()[0])
        assert node is not None
        np.testing.assert_allclose(np.asarray(node.material.kd)[0],
                                   [1, 0, 0], atol=1e-6)


class TestCadGate:
    def test_garbage_step_error(self, tmp_path):
        """A syntactically empty STEP file fails with an actionable
        CommandError (not a deep traceback)."""
        from cadrays_tpu.cli.commands import CommandError, Console, Session

        p = tmp_path / "part.step"
        p.write_text("ISO-10303-21;")
        c = Console(Session())
        with pytest.raises(CommandError,
                           match="no tessellatable B-rep"):
            c.exec(f"rtmeshread {p}")

    def test_custom_tessellator(self, tmp_path):
        from cadrays_tpu.geometry import cad

        def fake(path, deflection):
            return [primitives.box(1, 1, 1)]

        cad.register_tessellator(fake)
        try:
            meshes = cad.load_cad(str(tmp_path / "x.step"))
            assert meshes[0].num_triangles == 12
        finally:
            cad.register_tessellator(None)
            cad._TESSELLATOR = None


class TestPicking:
    def test_pick_and_autofocus(self, cornell_scene, cornell_camera):
        from cadrays_tpu.ops.picking import autofocus, pick

        data = cornell_scene.flatten(cornell_camera)
        info = pick(data, cornell_camera, 32.0, 32.0, 64, 64)
        assert info["hit"]
        assert 0.5 < info["t"] < 4.0
        cam2 = autofocus(data, cornell_camera, 64, 64)
        assert abs(float(cam2.focal_dist) - info["t"]) < 0.3

    def test_pick_miss(self, cornell_scene, cornell_camera):
        from cadrays_tpu.ops.picking import pick

        data = cornell_scene.flatten(cornell_camera)
        # top-left corner looks above the open box -> miss
        info = pick(data, cornell_camera, 0.0, 0.0, 64, 64)
        assert not info["hit"]

    def test_console_commands(self, cornell_scene, cornell_camera):
        from cadrays_tpu.cli.commands import Console, Session

        s = Session()
        s.scene = cornell_scene
        s.camera = cornell_camera
        s.width = s.height = 64
        c = Console(s)
        out = c.exec("vpick 32 32")
        assert out.startswith("hit")
        out = c.exec("vautofocus")
        assert out.startswith("focus")


class TestViewerInternals:
    def test_png_encode_from_session(self, cornell_scene, cornell_camera):
        from cadrays_tpu.cli.commands import Session
        from cadrays_tpu.cli.viewer import _encode_png
        from cadrays_tpu.integrator.progressive import progressive_step

        s = Session()
        s.scene = cornell_scene
        s.camera = cornell_camera
        s.width = s.height = 16
        data = s.scene.flatten(s.camera)
        s.progressive = progressive_step(data, s.camera, s.params, 16, 16,
                                         None, 1)
        png = _encode_png(s)
        assert png.startswith(b"\x89PNG")
        from cadrays_tpu.utils.image import read_png
        import io as _io
        import tempfile, os

        with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
            f.write(png)
            path = f.name
        img = read_png(path)
        os.unlink(path)
        assert img.shape == (16, 16, 3)


class TestEXR:
    def test_roundtrip(self, tmp_path):
        from cadrays_tpu.utils.image import read_exr, write_exr

        rng = np.random.default_rng(7)
        img = (rng.random((9, 13, 3)) * 40.0).astype(np.float32)
        p = str(tmp_path / "t.exr")
        write_exr(p, img)
        back = read_exr(p)
        assert back.shape == img.shape
        np.testing.assert_allclose(back, img, rtol=0, atol=0)
        # sanity: proper EXR magic so external tools accept it
        with open(p, "rb") as f:
            assert struct.unpack("<I", f.read(4))[0] == 20000630

    def test_save_image_dispatch(self, tmp_path):
        from cadrays_tpu.utils.image import load_image, save_image

        img = np.linspace(0, 4, 5 * 6 * 3, dtype=np.float32).reshape(5, 6, 3)
        p = str(tmp_path / "radiance.exr")
        save_image(p, img)
        back = load_image(p)
        np.testing.assert_allclose(back, img, atol=0)


class Test3DS:
    def test_roundtrip(self, tmp_path):
        from cadrays_tpu.geometry import primitives
        from cadrays_tpu.geometry.loaders.t3ds import load_3ds, save_3ds

        mesh = primitives.sphere(1.0, 16, 8)
        path = str(tmp_path / "s.3ds")
        save_3ds(path, mesh, "ball")
        parts = load_3ds(path)
        assert len(parts) == 1
        m = parts[0].mesh
        assert m.num_triangles == mesh.num_triangles
        assert m.uvs is not None and m.normals is not None
        # loader compacts unused vertices; compare world-space triangles
        np.testing.assert_allclose(
            np.sort(m.vertices[m.indices].reshape(-1, 9), axis=0),
            np.sort(mesh.vertices[mesh.indices].reshape(-1, 9), axis=0),
            atol=1e-6)

    def test_bad_magic(self, tmp_path):
        path = str(tmp_path / "bad.3ds")
        with open(path, "wb") as f:
            f.write(b"\x00" * 32)
        with pytest.raises(ValueError, match="magic"):
            from cadrays_tpu.geometry.loaders.t3ds import load_3ds

            load_3ds(path)

    def test_rtmeshread(self, tmp_path):
        from cadrays_tpu.cli.commands import Console, Session
        from cadrays_tpu.geometry import primitives
        from cadrays_tpu.geometry.loaders.t3ds import save_3ds

        path = str(tmp_path / "b.3ds")
        save_3ds(path, primitives.box(1, 1, 1), "b")
        console = Console(Session())
        console.exec(f"rtmeshread {path} b3ds")
        assert console.session.scene.model.get("b3ds").mesh.num_triangles == 12


class TestDXF:
    def test_roundtrip(self, tmp_path):
        from cadrays_tpu.geometry import primitives
        from cadrays_tpu.geometry.loaders.dxf import load_dxf, save_dxf

        mesh = primitives.box(1, 2, 3)
        path = str(tmp_path / "b.dxf")
        save_dxf(path, mesh, layer="walls")
        parts = load_dxf(path)
        assert len(parts) == 1 and parts[0].material_name == "walls"
        m = parts[0].mesh
        assert m.num_triangles == 12
        np.testing.assert_allclose(m.bounds()[1], [1, 2, 3], atol=1e-5)

    def test_polyface_mesh(self, tmp_path):
        # hand-written polyface: unit right triangle pair (a quad face)
        lines = ["0", "SECTION", "2", "ENTITIES",
                 "0", "POLYLINE", "8", "L", "70", "64",
                 "0", "VERTEX", "8", "L", "70", "192",
                 "10", "0", "20", "0", "30", "0",
                 "0", "VERTEX", "8", "L", "70", "192",
                 "10", "1", "20", "0", "30", "0",
                 "0", "VERTEX", "8", "L", "70", "192",
                 "10", "1", "20", "1", "30", "0",
                 "0", "VERTEX", "8", "L", "70", "192",
                 "10", "0", "20", "1", "30", "0",
                 "0", "VERTEX", "8", "L", "70", "128",
                 "71", "1", "72", "2", "73", "3", "74", "4",
                 "0", "SEQEND",
                 "0", "ENDSEC", "0", "EOF"]
        path = str(tmp_path / "p.dxf")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        from cadrays_tpu.geometry.loaders.dxf import load_dxf

        parts = load_dxf(path)
        assert parts[0].mesh.num_triangles == 2  # quad fan-split

    def test_empty_raises(self, tmp_path):
        path = str(tmp_path / "e.dxf")
        with open(path, "w") as f:
            f.write("0\nSECTION\n2\nENTITIES\n0\nENDSEC\n0\nEOF\n")
        from cadrays_tpu.geometry.loaders.dxf import load_dxf

        with pytest.raises(ValueError, match="3DFACE"):
            load_dxf(path)


class TestLdrFormats:
    def test_jpeg_save_load(self, tmp_path):
        pytest.importorskip("PIL")
        from cadrays_tpu.utils.image import load_image, save_image

        img = np.zeros((8, 8, 3), np.float32)
        img[:, :, 0] = 1.0
        path = str(tmp_path / "r.jpg")
        save_image(path, img)
        back = load_image(path, to_linear=False)
        assert back.shape == (8, 8, 3)
        assert back[:, :, 0].mean() > 0.9 and back[:, :, 1].mean() < 0.1

    def test_fbx_gated(self, tmp_path):
        from cadrays_tpu.cli.commands import CommandError, Console, Session

        # empty file: the native ASCII reader rejects it with a clear
        # message (binary FBX still points at the conversion shim)
        path = str(tmp_path / "x.fbx")
        open(path, "wb").close()
        with pytest.raises(CommandError, match="ASCII FBX"):
            Console(Session()).exec(f"rtmeshread {path}")
