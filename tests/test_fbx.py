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


def test_binary_fbx_raises(tmp_path):
    from cadrays_tpu.geometry.loaders.fbx import load_fbx

    p = tmp_path / "bin.fbx"
    p.write_bytes(b"Kaydara FBX Binary  \x00\x1a\x00" + b"\x00" * 64)
    with pytest.raises(ValueError, match="binary FBX"):
        load_fbx(str(p))


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
