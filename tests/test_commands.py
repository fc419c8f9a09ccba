"""Command surface + scene IO + loaders + scene-graph semantics."""
import os

import numpy as np
import pytest

from cadrays_tpu.cli.commands import CommandError, Console, Session
from cadrays_tpu.core.fresnel import FRESNEL_CONDUCTOR, FRESNEL_DIELECTRIC
from cadrays_tpu.geometry import primitives
from cadrays_tpu.geometry.loaders.obj import load_obj
from cadrays_tpu.geometry.loaders.ply import load_ply, save_ply
from cadrays_tpu.geometry.loaders.stl import load_stl
from cadrays_tpu.scene.materials import classify, preset, preset_names
from cadrays_tpu.scene.model import DataModel, DataNode, NodeType, Visibility


@pytest.fixture()
def console():
    return Console(Session())


CORNELL = os.path.join(os.path.dirname(__file__), "data", "cornell.crt")


class TestConsole:
    def test_unknown_command(self, console):
        with pytest.raises(CommandError, match="frob"):
            console.exec("frob 1")

    def test_modeling_and_display(self, console):
        console.exec("box b 1 2 3")
        console.exec("vdisplay b")
        node = console.session.scene.model.get("b")
        assert node is not None and node.mesh.num_triangles == 12

    def test_explode_box(self, console):
        console.exec("box b 1 1 1")
        out = console.exec("explode b FACE")
        assert out.split() == [f"b_{i}" for i in range(1, 7)]
        console.exec("vdisplay b_1 b_3")
        assert console.session.scene.model.has("b_1")

    def test_vbsdf_full_surface(self, console):
        console.exec("psphere s 1")
        console.exec("vdisplay s")
        console.exec("vbsdf s -Kd 0.1 0.2 0.3 -Ks 0.4 -baseRoughness 0.25 "
                     "-baseFresnel Conductor 0.2 3.0")
        console.exec("vbsdf s -Kt 0.5 -absorpColor 0.8 0.9 1.0 "
                     "-absorpCoeff 2 -coatFresnel Dielectric 1.6")
        m = console.session.scene.model.get("s").material
        np.testing.assert_allclose(np.asarray(m.kd)[0], [0.1, 0.2, 0.3])
        np.testing.assert_allclose(np.asarray(m.ks)[0], [0.4] * 3)
        assert float(m.base_rough[0]) == 0.25
        assert int(m.base_ftype[0]) == FRESNEL_CONDUCTOR
        assert int(m.coat_ftype[0]) == FRESNEL_DIELECTRIC

    def test_vbsdf_normalization(self, console):
        console.exec("box b 1 1 1; vdisplay b")
        console.exec("vbsdf b -Kd 0.9 -Ks 0.5 -n")
        m = console.session.scene.model.get("b").material
        total = np.asarray(m.kd + m.ks + m.kt)
        assert total.max() <= 1.0 + 1e-5

    def test_lights(self, console):
        console.exec("vlight clear")
        console.exec("vlight add positional pos 1 2 3 sm 0.1 int 5")
        console.exec("vlight add directional dir 0 0 -1 int 2")
        console.exec("vlight change 0 int 7 color 1 0.5 0.2")
        out = console.exec("vlight")
        assert "int=7" in out and "directional" in out
        console.exec("rtlight 1 -color 0.1 0.2 0.3")
        lt = console.session.scene.lights[1]
        np.testing.assert_allclose(np.asarray(lt.color)[0], [0.1, 0.2, 0.3])
        console.exec("vlight del 0")
        assert len(console.session.scene.lights) == 1

    def test_camera_commands(self, console):
        console.exec("vcamera -orthographic")
        from cadrays_tpu.core.camera import ORTHOGRAPHIC

        assert console.session.camera.projection == ORTHOGRAPHIC
        console.exec("vcamera -perspective -fovy 55 -aperture 0.02 -focus 3")
        cam = console.session.camera
        assert float(cam.fovy_deg) == 55.0
        assert float(cam.aperture) == pytest.approx(0.02)
        console.exec("vviewparams -eye 1 2 3 -at 0 0 0 -up 0 0 1")
        np.testing.assert_allclose(np.asarray(console.session.camera.eye),
                                   [1, 2, 3])

    def test_renderparams(self, console):
        console.exec("vrenderparams -gi -rayDepth 7 -clamping 50 "
                     "-tonemapping filmic -exposure 0.5 -whitepoint 2")
        p = console.session.params
        assert p.ray_depth == 7
        assert float(p.radiance_clamp) == 50.0
        from cadrays_tpu.core.tonemap import TONE_FILMIC

        assert p.tonemap.method == TONE_FILMIC

    def test_source_cornell_fixture(self, console):
        console.source(CORNELL)
        model = console.session.scene.model
        assert model.has("b_1") and model.has("s") and model.has("c")
        assert len(console.session.scene.lights) == 1
        assert console.session.params.ray_depth == 5

    def test_rtgroup_and_rotate(self, console):
        console.exec("box a 1 1 1; box b 1 1 1")
        console.exec("vdisplay a b")
        name = console.exec("rtgroup a b")
        grp = console.session.scene.model.get(name)
        assert [c.name for c in grp.children] == ["a", "b"]
        console.exec(f"rtrotate {name} 0 0 1 45")
        assert not np.allclose(grp.transform, np.eye(4))


class TestSceneGraph:
    def test_unique_names(self):
        dm = DataModel()
        n1 = dm.add(DataNode("obj", NodeType.POLY_MESH, primitives.quad()))
        n2 = dm.add(DataNode("obj", NodeType.POLY_MESH, primitives.quad()))
        assert n1.name == "obj" and n2.name == "obj_1"

    def test_visibility_tristate(self):
        dm = DataModel()
        parent = DataNode("p", NodeType.POLY_MESH)
        parent.add_child(DataNode("c1", NodeType.POLY_MESH, primitives.quad()))
        parent.add_child(DataNode("c2", NodeType.POLY_MESH, primitives.quad()))
        dm.add(parent)
        assert parent.visibility() == Visibility.VISIBLE
        dm.get("c1").hide()
        assert parent.visibility() == Visibility.PARTIAL
        dm.get("c2").hide()
        assert parent.visibility() == Visibility.HIDDEN

    def test_explode_compose_roundtrip(self):
        dm = DataModel()
        mesh = primitives.box(1, 1, 1)
        node = dm.add(DataNode("b", NodeType.CAD_SHAPE, mesh))
        tris_before = mesh.num_triangles
        parts = node.explode(registrar=dm.unique_name)
        assert len(parts) >= 2
        assert node.mesh is None
        node.compose()
        assert node.mesh is not None
        assert node.mesh.num_triangles == tris_before

    def test_remove_subtree(self):
        dm = DataModel()
        parent = DataNode("p", NodeType.POLY_MESH)
        parent.add_child(DataNode("c", NodeType.POLY_MESH, primitives.quad()))
        dm.add(parent)
        assert dm.has("c")
        dm.remove("p")
        assert not dm.has("p") and not dm.has("c")


class TestLoaders:
    def test_obj_roundtrip(self, tmp_path):
        p = tmp_path / "tri.obj"
        p.write_text(
            "mtllib tri.mtl\n"
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
            "vt 0 0\nvt 1 0\nvt 0 1\nvt 1 1\n"
            "vn 0 0 1\n"
            "usemtl red\nf 1/1/1 2/2/1 3/3/1\n"
            "usemtl blue\nf 2/2/1 4/4/1 3/3/1\n")
        (tmp_path / "tri.mtl").write_text(
            "newmtl red\nKd 1 0 0\nNs 10\n"
            "newmtl blue\nKd 0 0 1\nKs 0.5 0.5 0.5\n")
        parts = load_obj(str(p))
        assert len(parts) == 2
        by_name = {q.material_name: q for q in parts}
        assert by_name["red"].diffuse == (1.0, 0.0, 0.0)
        assert by_name["blue"].specular == (0.5, 0.5, 0.5)
        assert by_name["red"].mesh.num_triangles == 1
        assert by_name["red"].mesh.uvs is not None

    def test_obj_negative_indices_and_quads(self, tmp_path):
        p = tmp_path / "q.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                     "f -4 -3 -2 -1\n")
        parts = load_obj(str(p))
        assert parts[0].mesh.num_triangles == 2  # fan-triangulated quad

    @pytest.mark.parametrize("binary", [True, False])
    def test_ply_roundtrip(self, tmp_path, binary):
        mesh = primitives.sphere(1.0, 12, 6)
        path = str(tmp_path / "s.ply")
        save_ply(path, mesh, binary=binary)
        back = load_ply(path)
        assert back.num_triangles == mesh.num_triangles
        np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-6)
        np.testing.assert_allclose(back.normals, mesh.normals, atol=1e-6)
        np.testing.assert_allclose(back.uvs, mesh.uvs, atol=1e-6)

    def test_stl_binary(self, tmp_path):
        import struct

        mesh = primitives.box(1, 1, 1, origin_corner=False)
        path = str(tmp_path / "b.stl")
        with open(path, "wb") as f:
            f.write(b"\x00" * 80)
            f.write(struct.pack("<I", mesh.num_triangles))
            fn = mesh.face_normals()
            for t in range(mesh.num_triangles):
                f.write(struct.pack("<3f", *fn[t]))
                for k in range(3):
                    f.write(struct.pack("<3f",
                                        *mesh.vertices[mesh.indices[t, k]]))
                f.write(struct.pack("<H", 0))
        back = load_stl(path)
        assert back.num_triangles == 12
        assert back.num_vertices == 8  # welded

    def test_rtmeshread_command(self, tmp_path, console):
        mesh = primitives.sphere(1.0, 12, 6)
        path = str(tmp_path / "ball.ply")
        save_ply(path, mesh)
        out = console.exec(f"rtmeshread {path}")
        assert console.session.scene.model.has("ball")


class TestMaterialPresets:
    def test_presets_exist(self):
        for name in ("plastic", "glass", "gold", "silver", "brass"):
            assert name in preset_names()

    def test_classification(self):
        assert classify(preset("plaster")) == "matte"
        assert classify(preset("glass")) == "glass"
        assert classify(preset("gold")) == "metal"
        assert classify(preset("plastic")) == "glossy"

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            preset("unobtainium")


class TestSceneIO:
    def test_export_import_roundtrip(self, tmp_path, console):
        console.source(CORNELL)
        from cadrays_tpu.scene.io import export_scene, import_scene

        script = export_scene(console.session, str(tmp_path / "exp"))
        assert os.path.exists(script)
        s2 = Session()
        import_scene(s2, script)
        d1 = console.session.scene.flatten(console.session.camera)
        d2 = s2.scene.flatten(s2.camera)
        # CAD shapes round-trip PARAMETRICALLY (shapes/*.brep + restore)
        # and re-tessellate, so triangle counts may differ; the REFERENCED
        # geometry must cover the same bounds (meshes may carry unused
        # vertices, e.g. exploded box faces keep the full vertex table)
        # and materials must survive exactly.
        def used_bounds(d):
            v = np.asarray(d.geometry.vertices)
            used = np.unique(np.asarray(d.geometry.tri_v))
            return v[used].min(axis=0), v[used].max(axis=0)

        lo1, hi1 = used_bounds(d1)
        lo2, hi2 = used_bounds(d2)
        np.testing.assert_allclose(lo1, lo2, atol=1e-4)
        np.testing.assert_allclose(hi1, hi2, atol=1e-4)
        np.testing.assert_allclose(
            np.sort(np.asarray(d1.materials.kd), axis=0),
            np.sort(np.asarray(d2.materials.kd), axis=0), atol=1e-5)
        # camera round-trips
        np.testing.assert_allclose(np.asarray(s2.camera.eye),
                                   np.asarray(console.session.camera.eye),
                                   atol=1e-4)
        assert s2.params.ray_depth == console.session.params.ray_depth

    def test_export_roundtrip_ks_map_and_nested_groups(self, tmp_path,
                                                       console):
        """Round-2 advisor findings: Ks maps and nested groups must
        survive export -> import; same-basename textures must not
        collide; tiled imported UVs must not be rewritten on attach."""
        import numpy as np

        from cadrays_tpu.scene.io import export_scene, import_scene

        c = console
        c.exec("box a 1 1 1; vdisplay a; box b 1 1 1; vdisplay b")
        # two texture files sharing a basename in different dirs
        from cadrays_tpu.utils.image import write_png

        d1 = tmp_path / "t1"
        d2 = tmp_path / "t2"
        d1.mkdir()
        d2.mkdir()
        write_png(str(d1 / "wood.png"),
                  np.full((4, 4, 3), 0.25, np.float32))
        write_png(str(d2 / "wood.png"),
                  np.full((4, 4, 3), 0.75, np.float32))
        c.exec(f"rttexture a {d1 / 'wood.png'}")
        c.exec(f"rttexture a {d2 / 'wood.png'} -ks")
        c.exec("rtgroup a b -name inner")
        c.exec("box cc 1 1 1; vdisplay cc")
        c.exec("rtgroup inner cc -name outer")
        c.exec("vlocation outer -setLocation 1 2 3")

        script = export_scene(c.session, str(tmp_path / "exp"))
        s2 = Session()
        import_scene(s2, script)
        na = s2.scene.model.get("a")
        assert na is not None
        assert int(np.asarray(na.material.tex_id)[0]) >= 0
        assert int(np.asarray(na.material.ks_tex_id)[0]) >= 0
        # kd and ks maps are DIFFERENT textures despite equal basenames
        assert (int(np.asarray(na.material.tex_id)[0])
                != int(np.asarray(na.material.ks_tex_id)[0]))
        # nested group structure + cumulative transform survived
        outer = s2.scene.model.get("outer")
        inner = s2.scene.model.get("inner")
        assert outer is not None and inner is not None
        assert inner.parent is outer
        assert na.parent is inner
        world = na.world_transform()
        np.testing.assert_allclose(world[:3, 3], [1, 2, 3], atol=1e-5)

    def test_tiled_uvs_survive_texture_attach(self, console):
        """Imported UVs outside [0,1] express tiling; attach must not
        renormalize them (round-2 advisor finding)."""
        import numpy as np

        from cadrays_tpu.geometry.mesh import TriangleMesh
        from cadrays_tpu.scene.model import NodeType

        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        tris = np.array([[0, 1, 2]], np.int32)
        uvs = np.array([[0, 0], [4, 0], [0, 4]], np.float32)
        mesh = TriangleMesh(verts, tris, uvs=uvs)
        console.session.scene.add_mesh("tiled", mesh)
        console.session.scene.set_texture(
            "tiled", "synth", np.ones((2, 2, 3), np.float32))
        got = console.session.scene.model.get("tiled").mesh.uvs
        np.testing.assert_allclose(got, uvs)

    def test_settings_ini(self, tmp_path):
        from cadrays_tpu.utils.settings import Settings

        s = Settings(str(tmp_path / "s.ini"))
        s.set("view", "width", 800)
        s.set("view", "mode", "gi")
        s.dump()
        s2 = Settings(str(tmp_path / "s.ini"))
        assert s2.get_int("view", "width") == 800
        assert s2.get("view", "mode") == "gi"


class TestImageIO:
    def test_png_roundtrip(self, tmp_path):
        from cadrays_tpu.utils.image import read_png, write_png

        rs = np.random.RandomState(0)
        img = (rs.rand(9, 13, 3) * 255).astype(np.uint8)
        p = str(tmp_path / "t.png")
        write_png(p, img)
        back = read_png(p)
        np.testing.assert_allclose(back, img.astype(np.float32) / 255,
                                   atol=1e-6)

    def test_hdr_roundtrip(self, tmp_path):
        from cadrays_tpu.utils.image import read_hdr, write_hdr

        rs = np.random.RandomState(1)
        img = (rs.rand(7, 11, 3) * 100).astype(np.float32)
        p = str(tmp_path / "t.hdr")
        write_hdr(p, img)
        back = read_hdr(p)
        # RGBE shares one exponent across channels: the mantissa is 8 bits
        # and the writer truncates, so the error bound per pixel is
        # ~max_channel / 128
        bound = img.max(axis=-1, keepdims=True) / 128.0 + 1e-4
        assert np.all(np.abs(back - img) <= bound)

    def test_pfm_roundtrip(self, tmp_path):
        from cadrays_tpu.utils.image import read_pfm, write_pfm

        img = np.linspace(0, 10, 5 * 4 * 3, dtype=np.float32).reshape(4, 5, 3)
        p = str(tmp_path / "t.pfm")
        write_pfm(p, img)
        np.testing.assert_array_equal(read_pfm(p), img)


class TestMaterialLinks:
    """Material link/unlink (round-4): one edit updates all linked
    nodes, unlink leaves a private copy, links survive scene export —
    MaterialEditor.cxx:512-529, 548-563."""

    def _console(self):
        from cadrays_tpu.cli.commands import Console, Session

        c = Console(Session())
        for n in ("a", "b", "c"):
            c.exec(f"box {n} 1 1 1")
            c.exec(f"vdisplay {n}")
        return c

    def test_link_propagates_edits(self):
        import numpy as np

        c = self._console()
        c.exec("rtmatlink a b c")
        c.exec("vbsdf a -Kd 0.9 0.1 0.2")
        for n in ("a", "b", "c"):
            kd = np.asarray(
                c.session.scene.model.get(n).material.kd).reshape(-1)
            assert kd == pytest.approx([0.9, 0.1, 0.2]), n
        # editing a LINKED member propagates too (group semantics)
        c.exec("vbsdf b -Kd 0.1 0.8 0.1")
        kd = np.asarray(
            c.session.scene.model.get("a").material.kd).reshape(-1)
        assert kd == pytest.approx([0.1, 0.8, 0.1])
        assert "a b c" in c.exec("rtmatlink -print")

    def test_unlink_keeps_private_copy(self):
        import numpy as np

        c = self._console()
        c.exec("rtmatlink a b")
        c.exec("vbsdf a -Kd 0.9 0.1 0.2")
        c.exec("rtmatunlink b")
        c.exec("vbsdf a -Kd 0.0 0.0 1.0")
        kd_b = np.asarray(
            c.session.scene.model.get("b").material.kd).reshape(-1)
        assert kd_b == pytest.approx([0.9, 0.1, 0.2])  # frozen copy

    def test_links_survive_export(self, tmp_path):
        import os

        from cadrays_tpu.scene.io import export_scene

        c = self._console()
        c.exec("rtmatlink a b")
        script = export_scene(c.session, str(tmp_path / "exp"))
        text = open(script).read()
        assert "rtmatlink a b" in text

    def test_link_errors(self):
        from cadrays_tpu.cli.commands import CommandError

        c = self._console()
        with pytest.raises(CommandError):
            c.exec("rtmatlink a nosuch")
        with pytest.raises(CommandError):
            c.exec("rtmatlink onlyone")
