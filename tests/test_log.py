"""Structured logging (utils/log.py) — JSONL events + console mirror."""
import io
import json


def test_jsonl_events_and_levels(tmp_path):
    from cadrays_tpu.utils.log import configure, get_logger

    path = str(tmp_path / "run.jsonl")
    configure(path=path, level="info", human=False)
    log = get_logger("test")
    log.debug("hidden", x=1)         # below level
    log.info("render.start", scene="cornell", spp=8)
    log.error("io.missing", path="/nope")
    configure(human=False)  # close the file

    recs = [json.loads(l) for l in open(path)]
    assert [r["event"] for r in recs] == ["render.start", "io.missing"]
    assert recs[0]["component"] == "test"
    assert recs[0]["scene"] == "cornell" and recs[0]["spp"] == 8
    assert recs[1]["level"] == "error"
    assert all("ts" in r for r in recs)


def test_stream_output():
    from cadrays_tpu.utils.log import configure, get_logger

    buf = io.StringIO()
    configure(stream=buf, human=False)
    get_logger("s").warning("slow.path", ms=12.5)
    configure(human=False)
    rec = json.loads(buf.getvalue())
    assert rec["level"] == "warning" and rec["ms"] == 12.5


def test_render_cli_log_flag(tmp_path):
    import subprocess
    import sys
    # exercised via the in-process main to avoid a second jax startup
    from cadrays_tpu.cli.render import main

    logf = str(tmp_path / "r.jsonl")
    import os
    scene = os.path.join(os.path.dirname(__file__), "data", "cornell.crt")
    rc = main([scene, "--spp", "1", "--res", "16", "16",
               "--out", str(tmp_path / "o.png"), "--log", logf])
    assert rc == 0
    events = [json.loads(l)["event"] for l in open(logf)]
    assert "scene.load" in events and "render.done" in events
