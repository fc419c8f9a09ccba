"""Interactive viewer loop: orbit / pick / edit / pause over HTTP.

Covers the reference's interactive contract without a browser:
mouse orbit mutates the camera (OrbitControls.cxx:70-158), click
selection resolves the hit node for material editing (AppGui.cxx
onSelectionEvent:78-94), edits restart progressive accumulation
(AppViewer.cxx:979-984), pause stops the loop (:916-920).
"""
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest


@pytest.fixture()
def viewer():
    from cadrays_tpu.cli.commands import Console, Session
    from cadrays_tpu.cli.viewer import ViewerState, _make_handler

    s = Session()
    con = Console(s)
    con.exec("vlight add positional pos 0.5 0.5 0.85 sm 0.06 int 25")
    con.exec("psphere s 0.3")
    con.exec("vdisplay s")
    con.exec("vlocation s -setLocation 0.5 0.5 0.5")
    con.exec("vviewparams -eye 0.5 -1.5 0.5 -at 0.5 0.5 0.5 -up 0 0 1")
    con.exec("vrtsize 32 32")
    state = ViewerState(s)
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state, con))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield s, state, f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _post(url, path, body=b""):
    if isinstance(body, dict):
        body = json.dumps(body).encode()
    elif isinstance(body, str):
        body = body.encode()
    req = urllib.request.Request(url + path, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.read().decode()


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=30) as r:
        return r.read()


class TestViewerEndpoints:
    def test_status_and_page(self, viewer):
        s, state, url = viewer
        st = json.loads(_get(url, "/status"))
        assert st["width"] == 32 and st["paused"] is False
        assert b"cadrays_tpu" in _get(url, "/")

    def test_orbit_rotates_camera_and_restarts(self, viewer):
        from cadrays_tpu.integrator.progressive import progressive_step

        s, state, url = viewer
        data = s.scene.flatten(s.camera)
        st0 = progressive_step(data, s.camera, s.params, 32, 32, None, 1)
        assert int(st0.spp) == 1
        eye_before = np.asarray(s.camera.eye).copy()
        assert _post(url, "/orbit",
                     {"op": "rotate", "dx": 40, "dy": 0}) == "ok"
        assert not np.allclose(np.asarray(s.camera.eye), eye_before)
        # camera is part of the accumulation fingerprint -> restart
        st1 = progressive_step(data, s.camera, s.params, 32, 32, st0, 1)
        assert int(st1.spp) == 1  # restarted, not 2

    def test_orbit_pan_and_zoom(self, viewer):
        s, state, url = viewer
        at_before = np.asarray(s.camera.at).copy()
        _post(url, "/orbit", {"op": "pan", "dx": 30, "dy": -10})
        assert not np.allclose(np.asarray(s.camera.at), at_before)
        d_before = np.linalg.norm(
            np.asarray(s.camera.eye) - np.asarray(s.camera.at))
        _post(url, "/orbit", {"op": "zoom", "dx": 0, "dy": 1})
        d_after = np.linalg.norm(
            np.asarray(s.camera.eye) - np.asarray(s.camera.at))
        assert d_after < d_before

    def test_pick_resolves_node_then_edit(self, viewer):
        s, state, url = viewer
        out = _post(url, "/pick", {"x": 16, "y": 16})
        assert out.startswith("hit s "), out
        # the selection -> material-edit round trip
        _post(url, "/exec", "vbsdf s -kd 0.9 0.1 0.1")
        kd = np.asarray(s.scene.model.get("s").material.kd)[0]
        np.testing.assert_allclose(kd, [0.9, 0.1, 0.1], atol=1e-6)

    def test_pick_miss(self, viewer):
        s, state, url = viewer
        assert _post(url, "/pick", {"x": 1, "y": 1}) == "miss"

    def test_script_editor_roundtrip(self, viewer, tmp_path):
        """ScriptEditor parity: save / list / load / run / delete
        (ScriptEditor.cxx:48-64, 134-263)."""
        s, state, url = viewer
        s.cwd = str(tmp_path)
        _post(url, "/script", {"name": "t.crt",
                               "text": "psphere q 0.1\nvdisplay q\n"})
        assert json.loads(_get(url, "/scripts")) == ["t.crt"]
        assert b"psphere q" in _get(url, "/script?name=t.crt")
        out = _post(url, "/script", {"name": "t.crt",
                                     "text": "psphere q 0.1\nvdisplay q\n",
                                     "run": True})
        assert "saved + run" in out
        assert s.scene.model.get("q") is not None
        assert _post(url, "/script_delete", {"name": "t.crt"}) == "deleted"
        assert json.loads(_get(url, "/scripts")) == []

    def test_script_editor_rejects_bad_names(self, viewer, tmp_path):
        s, state, url = viewer
        s.cwd = str(tmp_path)
        out = _post(url, "/script", {"name": "../evil.sh", "text": "x"})
        assert "[error]" in out

    def test_pause_toggles(self, viewer):
        s, state, url = viewer
        assert _post(url, "/pause") == "paused"
        assert state.paused is True
        assert json.loads(_get(url, "/status"))["paused"] is True
        assert _post(url, "/pause") == "running"
        assert state.paused is False


class TestManipulationAndFlight:
    def test_drag_translates_picked_node_and_restarts(self, viewer):
        """Drag-gizmo: /manip changes the node transform and bumps the
        scene version so accumulation restarts
        (ImRaytraceControls.cxx:32-91)."""
        s, state, url = viewer
        before = np.array(s.scene.model.get("s").transform)
        v0 = s.scene._version
        out = _post(url, "/manip",
                    {"name": "s", "op": "translate", "dx": 40, "dy": 0})
        assert out == "ok"
        after = np.array(s.scene.model.get("s").transform)
        assert not np.allclose(before, after)
        # screen-space right drag moves along the camera right axis
        assert abs(after[0, 3] - before[0, 3]) > 1e-4
        assert s.scene._version != v0

    def test_manip_rotate_and_scale(self, viewer):
        s, state, url = viewer
        before = np.array(s.scene.model.get("s").transform)
        assert _post(url, "/manip",
                     {"name": "s", "op": "rotate", "dx": 30, "dy": 0}) == "ok"
        mid = np.array(s.scene.model.get("s").transform)
        assert not np.allclose(before[:3, :3], mid[:3, :3])
        assert _post(url, "/manip",
                     {"name": "s", "op": "scale", "dx": 0, "dy": -40}) == "ok"
        after = np.array(s.scene.model.get("s").transform)
        assert np.linalg.det(after[:3, :3]) > np.linalg.det(mid[:3, :3])

    def test_manip_unknown_node_errors(self, viewer):
        s, state, url = viewer
        out = _post(url, "/manip", {"name": "nope", "op": "translate",
                                    "dx": 1, "dy": 1})
        assert out.startswith("[error]")

    def test_fly_moves_and_looks(self, viewer):
        """WASD flight + mouse look (FlightControls.cxx:223-263,
        362-414)."""
        s, state, url = viewer
        eye0 = np.array(s.camera.eye)
        at0 = np.array(s.camera.at)
        assert _post(url, "/fly", {"keys": ["w"], "dt": 0.5}) == "ok"
        eye1 = np.array(s.camera.eye)
        assert np.linalg.norm(eye1 - eye0) > 1e-4
        # moved along the view direction
        fwd = (at0 - eye0) / np.linalg.norm(at0 - eye0)
        step = (eye1 - eye0) / np.linalg.norm(eye1 - eye0)
        assert float(fwd @ step) > 0.99
        assert _post(url, "/fly", {"dx": 25, "dy": 0}) == "ok"
        at1 = np.array(s.camera.at)
        assert not np.allclose(at1, at0 + (eye1 - eye0), atol=1e-5)


class TestEditorPanels:
    """Round-4 structured editor panels: scene tree with per-node eye
    (DataModelWidget.cxx:246-264), material panel over the vbsdf path
    (MaterialEditor.cxx:639-1099), light list with add/clone/delete
    (LightSourcesEditor.cxx:47-87)."""

    def test_tree_and_eye_toggle(self, viewer):
        s, state, url = viewer
        roots = json.loads(_get(url, "/tree"))
        names = []

        def walk(n):
            names.append(n["name"])
            for c in n["children"]:
                walk(c)
        for r in roots:
            walk(r)
        assert "s" in names
        v0 = s.scene._version
        assert _post(url, "/node", {"name": "s", "op": "hide"}) == "ok"
        assert s.scene.model.get("s").visible is False
        assert s.scene._version != v0  # restart fingerprint
        _post(url, "/node", {"name": "s", "op": "toggle"})
        assert s.scene.model.get("s").visible is True
        assert "[error]" in _post(url, "/node", {"name": "nope"})

    def test_material_panel_roundtrip(self, viewer):
        s, state, url = viewer
        m = json.loads(_get(url, "/material?name=s"))
        assert m["preset"] in ("matte", "glossy") and len(m["kd"]) == 3
        out = _post(url, "/material", {
            "name": "s", "kd": [0.9, 0.1, 0.2], "baseRoughness": 0.3,
            "baseFresnel": {"type": "Schlick", "params": [0.1, 0.2, 0.3]},
        })
        assert "[error]" not in out
        m2 = json.loads(_get(url, "/material?name=s"))
        assert m2["kd"] == pytest.approx([0.9, 0.1, 0.2])
        assert m2["baseRoughness"] == pytest.approx(0.3)
        assert m2["baseFresnel"]["type"] == "Schlick"
        assert m2["baseFresnel"]["params"][:3] == pytest.approx(
            [0.1, 0.2, 0.3])
        # preset swap reclassifies
        _post(url, "/material", {"name": "s", "preset": "glass"})
        assert json.loads(_get(url, "/material?name=s"))["preset"] == "glass"

    def test_light_panel_add_clone_delete(self, viewer):
        s, state, url = viewer
        base = json.loads(_get(url, "/lights"))
        n0 = len(base)
        assert any(l["kind"] == "positional" for l in base)
        _post(url, "/light", {"op": "add", "kind": "directional",
                              "vec": [0, 0, -1], "intensity": 5,
                              "smooth": 0.2})
        ls = json.loads(_get(url, "/lights"))
        assert len(ls) == n0 + 1 and ls[n0]["kind"] == "directional"
        assert ls[n0]["intensity"] == pytest.approx(5)
        _post(url, "/light", {"op": "clone", "idx": n0})
        ls = json.loads(_get(url, "/lights"))
        assert len(ls) == n0 + 2
        assert ls[n0 + 1]["smooth"] == pytest.approx(ls[n0]["smooth"],
                                                     abs=1e-5)
        _post(url, "/light", {"op": "change", "idx": 0,
                              "intensity": 42.0})
        assert json.loads(_get(url, "/lights"))[0]["intensity"] == \
            pytest.approx(42.0)
        _post(url, "/light", {"op": "del", "idx": n0 + 1})
        assert len(json.loads(_get(url, "/lights"))) == n0 + 1


class TestPickPromotion:
    """Common-ancestor selection (AppViewer.cxx:283-460): picking a
    grouped leaf selects its topmost group; repeating the pick drills
    one level toward the leaf."""

    def test_group_promotion_and_drilldown(self, viewer):
        s, state, url = viewer
        # group the sphere under a parent (sibling group of one)
        assert s.scene.model.group(["s"], "grp") is not None
        out = _post(url, "/pick", {"x": 16, "y": 16})
        assert out.startswith("hit grp "), out
        assert "leaf=s" in out
        # picking again with the group selected drills to the leaf
        out2 = _post(url, "/pick", {"x": 16, "y": 16, "prev": "grp"})
        assert out2.startswith("hit s "), out2


class TestSettingsPanel:
    """Render-settings panel (SettingsWidget.cxx parity): read-back +
    edits through the validated vrenderparams/vrtsize/vcamera path."""

    def test_settings_roundtrip(self, viewer):
        s, state, url = viewer
        st = json.loads(_get(url, "/settings"))
        assert st["mode"] == "gi" and st["width"] == 32
        out = _post(url, "/settings", {"ray_depth": 7, "clamp": 12.5,
                                       "width": 48, "height": 40,
                                       "two_sided": False, "fovy": 55})
        assert "[error]" not in out
        st2 = json.loads(_get(url, "/settings"))
        assert st2["ray_depth"] == 7
        assert st2["clamp"] == pytest.approx(12.5)
        assert (st2["width"], st2["height"]) == (48, 40)
        assert st2["two_sided"] is False
        assert st2["fovy"] == pytest.approx(55)
        # mode switch
        _post(url, "/settings", {"mode": "rt"})
        assert json.loads(_get(url, "/settings"))["mode"] == "rt"


class TestTransformPanel:
    """Numeric TRS panel endpoints (TransformWidget.cxx:112-246)."""

    def test_get_single_decomposes_local(self, viewer):
        s, state, url = viewer
        t = json.loads(_get(url, "/transform?names=s"))
        assert t["mode"] == "absolute"
        assert t["translation"] == pytest.approx([0.5, 0.5, 0.5])
        assert t["rotation_deg"] == pytest.approx([0, 0, 0], abs=1e-5)
        assert t["scale"] == pytest.approx([1, 1, 1])

    def test_post_absolute_roundtrip(self, viewer):
        s, state, url = viewer
        _post(url, "/transform", {
            "names": ["s"], "translation": [1.0, 2.0, 3.0],
            "rotation_deg": [10.0, 20.0, 30.0], "scale": [2.0, 2.0, 2.0]})
        t = json.loads(_get(url, "/transform?names=s"))
        assert t["translation"] == pytest.approx([1, 2, 3], abs=1e-5)
        assert t["rotation_deg"] == pytest.approx([10, 20, 30], abs=1e-3)
        assert t["scale"] == pytest.approx([2, 2, 2], abs=1e-5)
        node = s.scene.model.get("s")
        assert np.linalg.det(np.asarray(node.transform)[:3, :3]) == \
            pytest.approx(8.0, rel=1e-4)

    def test_reset(self, viewer):
        s, state, url = viewer
        _post(url, "/transform", {"names": ["s"],
                                  "translation": [9, 9, 9],
                                  "rotation_deg": [0, 0, 0],
                                  "scale": [1, 1, 1]})
        _post(url, "/transform", {"names": ["s"], "reset": True})
        assert np.allclose(np.asarray(s.scene.model.get("s").transform),
                           np.eye(4))

    def test_multi_select_delta_about_anchor(self, viewer):
        s, state, url = viewer
        from cadrays_tpu.cli.commands import Console

        con = Console(s)
        con.exec("psphere q 0.2")
        con.exec("vdisplay q")
        con.exec("vlocation q -setLocation 1.5 0.5 0.5")
        t = json.loads(_get(url, "/transform?names=s,q"))
        assert t["mode"] == "delta"
        anchor = t["translation"]
        assert anchor == pytest.approx([1.0, 0.5, 0.5], abs=1e-5)
        # rotate both 180deg about Z at the anchor: the two spheres swap
        _post(url, "/transform", {
            "names": ["s", "q"], "translation": anchor,
            "rotation_deg": [0.0, 0.0, 180.0], "scale": [1, 1, 1]})
        ts = np.asarray(s.scene.model.get("s").transform)[:3, 3]
        tq = np.asarray(s.scene.model.get("q").transform)[:3, 3]
        assert ts == pytest.approx([1.5, 0.5, 0.5], abs=1e-4)
        assert tq == pytest.approx([0.5, 0.5, 0.5], abs=1e-4)

    def test_edit_restarts_accumulation(self, viewer):
        s, state, url = viewer
        v0 = s.scene._version
        _post(url, "/transform", {"names": ["s"],
                                  "translation": [0.6, 0.5, 0.5],
                                  "rotation_deg": [0, 0, 0],
                                  "scale": [1, 1, 1]})
        assert s.scene._version != v0

    def test_unknown_node_404(self, viewer):
        s, state, url = viewer
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            _get(url, "/transform?names=nope")

    def test_multi_select_nested_parent_frame(self, viewer):
        """A world-space anchor delta must be conjugated into each
        node's PARENT frame: with a transformed parent group, a raw
        local pre-multiply would rotate about a parent-warped pivot."""
        s, state, url = viewer
        from cadrays_tpu.cli.commands import Console

        con = Console(s)
        con.exec("psphere n1 0.1")
        con.exec("psphere n2 0.1")
        con.exec("vdisplay n1 n2")
        con.exec("vlocation n1 -setLocation 1 0 0")
        con.exec("vlocation n2 -setLocation 3 0 0")
        con.exec("rtgroup n1 n2 -name grp")
        grp = s.scene.model.get("grp")
        # parent carries a translation of (0, 5, 0)
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = (0, 5, 0)
        grp.transform = m
        t = json.loads(_get(url, "/transform?names=n1,n2"))
        anchor = t["translation"]
        # world centers: (1,5,0) and (3,5,0) -> anchor (2,5,0)
        assert anchor == pytest.approx([2, 5, 0], abs=1e-4)
        _post(url, "/transform", {
            "names": ["n1", "n2"], "translation": anchor,
            "rotation_deg": [0, 0, 180], "scale": [1, 1, 1]})
        # after a world-space 180deg about (2,5,0) the spheres swap
        w1 = (np.asarray(s.scene.model.get("n1").world_transform())
              @ [0, 0, 0, 1])[:3]
        w2 = (np.asarray(s.scene.model.get("n2").world_transform())
              @ [0, 0, 0, 1])[:3]
        assert w1 == pytest.approx([3, 5, 0], abs=1e-3)
        assert w2 == pytest.approx([1, 5, 0], abs=1e-3)
