"""Native ASCII-FBX reader (geometry/loaders/fbx.py).

Fixture is a hand-written FBX 7.4 ASCII document: one quad-faced
pyramid-ish mesh under a translated+rotated model with a material —
exercising polygon fan triangulation, negative index termination,
Properties70 parsing, OO connections, Y-up -> Z-up conversion and
material color pickup (ImportSettingsEditor.cxx:199-277 parity).
"""
import numpy as np
import pytest

FBX_DOC = """; FBX 7.4 project file
FBXHeaderExtension:  {
    FBXVersion: 7400
}
GlobalSettings:  {
    Properties70:  {
        P: "UpAxis", "int", "Integer", "",1
        P: "UpAxisSign", "int", "Integer", "",1
    }
}
Objects:  {
    Geometry: 1000, "Geometry::Quad", "Mesh" {
        Vertices: *12 {
            a: 0,0,0, 2,0,0, 2,2,0, 0,2,0
        }
        PolygonVertexIndex: *4 {
            a: 0,1,2,-4
        }
        LayerElementUV: 0 {
            MappingInformationType: "ByPolygonVertex"
            ReferenceInformationType: "IndexToDirect"
            UV: *8 {
                a: 0,0, 1,0, 1,1, 0,1
            }
            UVIndex: *4 {
                a: 0,1,2,3
            }
        }
    }
    Model: 2000, "Model::Quad", "Mesh" {
        Properties70:  {
            P: "Lcl Translation", "Lcl Translation", "", "A",1,2,3
            P: "Lcl Scaling", "Lcl Scaling", "", "A",2,2,2
        }
    }
    Material: 3000, "Material::Red", "" {
        Properties70:  {
            P: "DiffuseColor", "Color", "", "A",0.8,0.1,0.2
            P: "SpecularColor", "Color", "", "A",0.5,0.5,0.5
            P: "ShininessExponent", "Number", "", "A",32
        }
    }
}
Connections:  {
    C: "OO",1000,2000
    C: "OO",3000,2000
    C: "OO",2000,0
}
"""


@pytest.fixture()
def fbx_file(tmp_path):
    p = tmp_path / "quad.fbx"
    p.write_text(FBX_DOC)
    return str(p)


def test_load_fbx_geometry_and_material(fbx_file):
    from cadrays_tpu.geometry.loaders.fbx import load_fbx

    parts = load_fbx(fbx_file)
    assert len(parts) == 1
    p = parts[0]
    # one quad -> 2 triangles
    assert p.mesh.num_triangles == 2
    assert p.material_name == "Red"
    assert p.diffuse == pytest.approx((0.8, 0.1, 0.2))
    assert p.specular == pytest.approx((0.5, 0.5, 0.5))
    assert p.shininess == 32
    # UVs present (IndexToDirect)
    assert p.mesh.uvs is not None
    assert float(p.mesh.uvs.max()) == 1.0

    # transform: scale 2, translate (1,2,3), then FBX Y-up -> Z-up.
    # local corner (2,2,0) -> scaled (4,4,0) -> +T (5,6,3) -> z-up
    # (x, -z, y) = (5, -3, 6)
    v = np.asarray(p.mesh.vertices)
    assert np.any(np.all(np.isclose(v, [5, -3, 6], atol=1e-5), axis=1))


def _write_binary_fbx(path, version=7400):
    """Spec-conformant Kaydara FBX Binary writer for the same document
    as FBX_DOC: exercises zlib-deflated arrays (Encoding=1), the
    name\\x00\\x01class string convention, int64/double scalar props and
    nested node records with null terminators."""
    import struct
    import zlib

    wide = version >= 7500
    offs_fmt = "<QQQB" if wide else "<IIIB"
    null_rec = b"\x00" * struct.calcsize(offs_fmt)

    def prop(v):
        if isinstance(v, bytes):  # pre-encoded (arrays)
            return v
        if isinstance(v, str):
            b = v.encode()
            return b"S" + struct.pack("<I", len(b)) + b
        if isinstance(v, float):
            return b"D" + struct.pack("<d", v)
        return b"L" + struct.pack("<q", v)

    def arr(code, dtype, vals):
        raw = np.asarray(vals, dtype).tobytes()
        comp = zlib.compress(raw)
        return (code + struct.pack("<III", len(vals), 1, len(comp))
                + comp)

    def obj_name(name, cls):
        return f"{name}\x00\x01{cls}"

    def node(name, props=(), children=()):
        return (name, list(props), list(children))

    def emit(n, offset):
        name, props, children = n
        pdata = b"".join(prop(p) for p in props)
        cdata = b""
        # header size placeholder computed after children
        hdr = struct.calcsize(offs_fmt) + len(name)
        body_start = offset + hdr + len(pdata)
        if children:
            pos = body_start
            for c in children:
                cb = emit(c, pos)
                cdata += cb
                pos += len(cb)
            cdata += null_rec
        end = body_start + len(cdata)
        head = struct.pack(offs_fmt, end, len(props), len(pdata),
                           len(name)) + name.encode()
        return head + pdata + cdata

    def P(*vals):
        return node("P", vals)

    doc = [
        node("FBXHeaderExtension", (), [node("FBXVersion", (version,))]),
        node("GlobalSettings", (), [
            node("Properties70", (), [
                P("UpAxis", "int", "Integer", "", 1),
                P("UpAxisSign", "int", "Integer", "", 1)])]),
        node("Objects", (), [
            node("Geometry", (1000, obj_name("Quad", "Geometry"), "Mesh"), [
                node("Vertices", (arr(b"d", "<f8",
                     [0, 0, 0, 2, 0, 0, 2, 2, 0, 0, 2, 0]),)),
                node("PolygonVertexIndex", (arr(b"i", "<i4",
                     [0, 1, 2, -4]),)),
                node("LayerElementUV", (0,), [
                    node("MappingInformationType", ("ByPolygonVertex",)),
                    node("ReferenceInformationType", ("IndexToDirect",)),
                    node("UV", (arr(b"d", "<f8",
                         [0, 0, 1, 0, 1, 1, 0, 1]),)),
                    node("UVIndex", (arr(b"i", "<i4", [0, 1, 2, 3]),))]),
            ]),
            node("Model", (2000, obj_name("Quad", "Model"), "Mesh"), [
                node("Properties70", (), [
                    P("Lcl Translation", "Lcl Translation", "", "A",
                      1.0, 2.0, 3.0),
                    P("Lcl Scaling", "Lcl Scaling", "", "A",
                      2.0, 2.0, 2.0)])]),
            node("Material", (3000, obj_name("Red", "Material"), ""), [
                node("Properties70", (), [
                    P("DiffuseColor", "Color", "", "A", 0.8, 0.1, 0.2),
                    P("SpecularColor", "Color", "", "A", 0.5, 0.5, 0.5),
                    P("ShininessExponent", "Number", "", "A", 32.0)])]),
        ]),
        node("Connections", (), [
            node("C", ("OO", 1000, 2000)),
            node("C", ("OO", 3000, 2000)),
            node("C", ("OO", 2000, 0))]),
    ]

    blob = b"Kaydara FBX Binary  \x00\x1a\x00" + struct.pack("<I", version)
    for n in doc:
        blob += emit(n, len(blob))
    blob += null_rec
    with open(path, "wb") as f:
        f.write(blob)


@pytest.mark.parametrize("version", [7400, 7500])
def test_binary_fbx_loads(tmp_path, version):
    """Round-4: the native reader parses binary FBX (zlib arrays, both
    32-bit <2016 and 64-bit >=2016 record layouts) into the same parts
    as the equivalent ASCII document — closes the Assimp import matrix
    FBX entry (ImportSettingsEditor.cxx:199-277) minus BLEND."""
    from cadrays_tpu.geometry.loaders.fbx import load_fbx

    p = tmp_path / "bin.fbx"
    _write_binary_fbx(str(p), version=version)
    parts = load_fbx(str(p))
    assert len(parts) == 1
    part = parts[0]
    assert part.mesh.num_triangles == 2
    assert part.material_name == "Red"
    assert part.diffuse == pytest.approx((0.8, 0.1, 0.2))
    assert part.shininess == 32
    v = np.asarray(part.mesh.vertices)
    assert np.any(np.all(np.isclose(v, [5, -3, 6], atol=1e-5), axis=1))


def test_rtmeshread_fbx(fbx_file):
    from cadrays_tpu.cli.commands import Console, Session

    c = Console(Session())
    c.exec(f"rtmeshread {fbx_file} quad")
    c.exec("vdisplay quad")
    node = c.session.scene.model.get("quad")
    assert node is not None
    leaves = [n for n in node.traverse() if n.mesh is not None]
    assert sum(n.mesh.num_triangles for n in leaves) == 2
    kd = np.asarray(leaves[0].material.kd).reshape(-1)
    assert kd == pytest.approx([0.8, 0.1, 0.2], abs=1e-5)
