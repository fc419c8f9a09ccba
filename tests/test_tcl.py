"""Tcl-backed console: full language semantics over the command surface.

The reference's console IS a Tcl interpreter (Draw_Interpretor,
main.cxx:44-55) — scene scripts use proc/for/expr/catch freely
(data/scripts/Materials.tcl). These tests exercise that parity through
cli/tcl.py plus the DRAW modeling/transform commands the scripts need.
"""
import numpy as np
import pytest

from cadrays_tpu.cli.commands import CommandError, Console, Session, make_console

tcl_mod = pytest.importorskip("cadrays_tpu.cli.tcl")


@pytest.fixture()
def tc():
    return tcl_mod.TclConsole(Session())


class TestTclLanguage:
    def test_make_console_prefers_tcl(self):
        assert type(make_console()).__name__ == "TclConsole"

    def test_variables_and_expr(self, tc):
        tc.exec("set s 3; box b [expr {$s * 2}] 1 1; vdisplay b")
        lo, hi = tc.session.scene.model.get("b").mesh.bounds()
        assert hi[0] - lo[0] == pytest.approx(6.0)

    def test_proc_and_for_loop(self, tc):
        tc.exec("""
            proc mk {name r} { psphere $name $r ; vdisplay $name }
            for {set i 1} {$i <= 4} {incr i} { mk s$i $i }
        """)
        for i in range(1, 5):
            assert tc.session.scene.model.has(f"s{i}")

    def test_catch_preserves_error_message(self, tc):
        assert tc.exec("catch {vbsdf nosuch -Kd 1} m") == "1"
        assert "nosuch" in tc.exec("set m")

    def test_unknown_command_clean_error(self, tc):
        with pytest.raises(CommandError, match="frobnicate"):
            tc.exec("frobnicate 1 2")

    def test_lrepeat_compound_explode(self, tc):
        """The Materials.tcl floor idiom."""
        tc.exec("""
            box tile 10 10 0.1
            eval compound [lrepeat 4 tile] tiles
            explode tiles
            for {set i 1} {$i <= 4} {incr i} {
                ttranslate tiles_$i [expr $i * 10] 0 0
                vdisplay -noupdate tiles_$i
            }
        """)
        for i in range(1, 5):
            node = tc.session.scene.model.get(f"tiles_{i}")
            lo, _ = node.mesh.bounds()
            assert lo[0] == pytest.approx(i * 10)

    def test_command_result_flows_into_tcl(self, tc):
        tc.exec("box b 1 1 1")
        assert tc.exec("llength [explode b FACE]") == "6"


class TestDrawTransforms:
    """New DRAW kernel commands, on the plain console too (shared path)."""

    @pytest.fixture(params=["plain", "tcl"])
    def console(self, request):
        if request.param == "plain":
            return Console(Session())
        return tcl_mod.TclConsole(Session())

    def test_wedge(self, console):
        console.exec("wedge w 10 5 8 4")
        console.exec("vdisplay w")
        mesh = console.session.scene.model.get("w").mesh
        lo, hi = mesh.bounds()
        np.testing.assert_allclose(hi, [10, 5, 8], atol=1e-5)
        # top ring shrunk to ltx=4
        top = mesh.vertices[mesh.vertices[:, 1] > 4.9]
        assert top[:, 0].max() == pytest.approx(4.0)

    def test_trotate_staged(self, console):
        console.exec("box b 2 2 2")
        console.exec("trotate b 0 0 0 0 0 1 90")
        console.exec("vdisplay b")
        lo, hi = console.session.scene.model.get("b").mesh.bounds()
        np.testing.assert_allclose(lo, [-2, 0, 0], atol=1e-5)
        np.testing.assert_allclose(hi, [0, 2, 2], atol=1e-5)

    def test_tscale_about_point(self, console):
        console.exec("box b 1 1 1; tscale b 1 1 1 2; vdisplay b")
        lo, hi = console.session.scene.model.get("b").mesh.bounds()
        np.testing.assert_allclose(lo, [-1, -1, -1], atol=1e-5)
        np.testing.assert_allclose(hi, [1, 1, 1], atol=1e-5)

    def test_tmirror_flips_winding(self, console):
        console.exec("box b 1 1 1; tmirror b 0 0 0 1 0 0; vdisplay b")
        mesh = console.session.scene.model.get("b").mesh
        lo, hi = mesh.bounds()
        np.testing.assert_allclose(lo, [-1, 0, 0], atol=1e-5)
        # outward orientation preserved: signed volume still positive
        v = mesh.vertices
        tri = v[mesh.indices]
        vol = np.einsum("ij,ij->i", tri[:, 0],
                        np.cross(tri[:, 1], tri[:, 2])).sum() / 6.0
        assert vol > 0

    def test_copy_renamevar_compound(self, console):
        console.exec("box a 1 1 1; copy a b; ttranslate b 5 0 0; "
                     "compound a b ab; renamevar ab merged; vdisplay merged")
        mesh = console.session.scene.model.get("merged").mesh
        assert mesh.num_triangles == 24
        lo, hi = mesh.bounds()
        assert hi[0] == pytest.approx(6.0)

    def test_donly(self, console):
        console.exec("box a 1 1 1; box b 1 1 1; vdisplay a b; donly a")
        model = console.session.scene.model
        assert model.get("a").visibility().name == "VISIBLE"
        assert model.get("b").visibility().name == "HIDDEN"

    def test_incmesh_accepted(self, console):
        console.exec("box a 1 1 1; incmesh a 0.01")
