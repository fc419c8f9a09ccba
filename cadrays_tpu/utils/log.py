"""Structured logging: JSON-lines events with levels + console mirror.

The reference pipes std::cout/cerr into its in-app console and
color-codes `[error]` lines (AppGui.cxx:982-999, AppConsole.cxx:154-170)
— workable for a desktop tool, but this framework also runs headless at
scale, where logs must be machine-parseable. Events are emitted as one
JSON object per line on the configured stream (and optionally a file),
with the reference's `[error]`-style human mirror preserved for the
interactive console.

    from cadrays_tpu.utils.log import get_logger
    log = get_logger("render")
    log.info("render.start", scene="cornell", spp=64)
    log.error("io.missing", path=path)

Configure once per process:
    configure(path="run.jsonl", level="debug", human=True)
"""
from __future__ import annotations

import json
import sys
import threading
import time
from typing import Optional

_LEVELS = {"debug": 10, "info": 20, "warning": 30, "error": 40}

_lock = threading.Lock()
_state = {
    "level": 20,
    "file": None,       # opened file object for JSONL output
    "human": True,      # mirror to stderr in `[level] event k=v` form
    "stream": None,     # JSONL stream (None = disabled unless file set)
}


def configure(path: Optional[str] = None, level: str = "info",
              human: bool = True, stream=None) -> None:
    """Set process-wide logging: `path` appends JSON lines to a file,
    `stream` (e.g. sys.stdout) writes them to a stream, `human` mirrors
    events to stderr in the console-friendly form."""
    with _lock:
        if _state["file"] is not None:
            _state["file"].close()
        _state["file"] = open(path, "a") if path else None
        _state["level"] = _LEVELS.get(level, 20)
        _state["human"] = human
        _state["stream"] = stream


class Logger:
    __slots__ = ("component",)

    def __init__(self, component: str):
        self.component = component

    def _emit(self, level: str, event: str, **fields) -> None:
        if _LEVELS[level] < _state["level"]:
            return
        rec = {"ts": round(time.time(), 3), "level": level,
               "component": self.component, "event": event}
        rec.update(fields)
        line = json.dumps(rec, default=str)
        with _lock:
            f = _state["file"]
            if f is not None:
                f.write(line + "\n")
                f.flush()
            if _state["stream"] is not None:
                _state["stream"].write(line + "\n")
            if _state["human"]:
                kv = " ".join(f"{k}={v}" for k, v in fields.items())
                tag = "[error]" if level == "error" else f"[{level}]"
                print(f"{tag} {self.component}.{event} {kv}".rstrip(),
                      file=sys.stderr)

    def debug(self, event: str, **fields) -> None:
        self._emit("debug", event, **fields)

    def info(self, event: str, **fields) -> None:
        self._emit("info", event, **fields)

    def warning(self, event: str, **fields) -> None:
        self._emit("warning", event, **fields)

    def error(self, event: str, **fields) -> None:
        self._emit("error", event, **fields)


def get_logger(component: str) -> Logger:
    return Logger(component)
