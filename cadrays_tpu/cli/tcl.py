"""Real TCL interpreter backing for the command surface.

The reference embeds a full OCCT DRAW TCL interpreter (main.cxx:44-55):
its scene scripts are genuine Tcl programs — `proc`, `set`, `for`,
`foreach`, `while`, `expr`, `catch` and variable substitution all work
(see data/scripts/Materials.tcl's proc/for loops). The pure-Python
`Console` in cli/commands.py parses one command per line and cannot run
those. This module upgrades it to a *real* Tcl 8.6 interpreter (CPython's
bundled `tkinter.Tcl()`, no window/display needed): every `cmd_*` handler
is exposed as a native Tcl command, so scripts get the full language for
free, exactly like the reference's `Draw_Interpretor::Eval`
(AppConsole.cxx:211-259).

Error protocol: a Python handler can't raise *into* Tcl with its message
intact through tkinter, so each command is registered as a hidden
`__py_<name>` returning a `{status result}` list, wrapped by a Tcl proc
that re-raises via `error` — which makes `catch {vbsdf bad}` behave like
stock Tcl.
"""
from __future__ import annotations

from typing import List, Optional

from cadrays_tpu.cli.commands import CommandError, Console, Session

_PROC_TEMPLATE = """
proc {name} {{args}} {{
    set __r [__py_{name} {{*}}$args]
    if {{[lindex $__r 0] eq "err"}} {{
        return -code error [lindex $__r 1]
    }}
    return [lindex $__r 1]
}}
"""

# Commands accepted for script parity but meaningless here (host-side
# tessellation hints etc. — we tessellate at primitive creation).
_ACCEPT_NOOP = ("incmesh", "isos", "vzbufftrihedron", "vglinfo")


class TclConsole:
    """Tcl-interpreter console over a `Session`.

    Same `.exec(line)` / `.source(path)` surface as
    `cadrays_tpu.cli.commands.Console`, but `line` may be any Tcl script.
    """

    def __init__(self, session: Optional[Session] = None):
        import tkinter

        self._tkinter = tkinter
        self.base = Console(session or Session())
        self.session = self.base.session
        self.history: List[str] = self.base.history
        self.interp = tkinter.Tcl()
        self._register()

    # -- registration -------------------------------------------------------
    def _wrap(self, handler):
        def fn(*args):
            try:
                return ("ok", handler(list(args)) or "")
            except CommandError as e:
                return ("err", str(e))
            except Exception as e:  # keep the interp alive on internal bugs
                return ("err", f"{type(e).__name__}: {e}")

        return fn

    def _register(self) -> None:
        interp = self.interp
        for name, handler in self.base._handlers.items():
            if name == "source":
                continue  # Tcl's own `source` does full-script evaluation
            interp.createcommand(f"__py_{name}", self._wrap(handler))
            interp.eval(_PROC_TEMPLATE.format(name=name))
        for name in _ACCEPT_NOOP:
            interp.eval(f"proc {name} {{args}} {{ return \"\" }}")
        # `source` resolves against the session cwd (scene exports load
        # their assets relative to the script, scene/io.py:import_scene).
        interp.createcommand("__py_resolve",
                             lambda p: self.session.resolve(p))
        interp.eval("""
            rename source __tcl_source
            proc source {path} { uplevel #0 __tcl_source [list [__py_resolve $path]] }
        """)
        # Stock Tcl `unknown` tries auto-load and shelling out; fail clean
        # like the reference console instead.
        interp.eval("""
            proc unknown {cmd args} {
                return -code error "unknown command '$cmd' (try 'help')"
            }
        """)

    # -- driver --------------------------------------------------------------
    def exec(self, line: str) -> str:
        """Evaluate a Tcl script (one line or many)."""
        self.history.append(line)
        try:
            return self.interp.eval(line)
        except self._tkinter.TclError as e:
            raise CommandError(str(e)) from e

    def source(self, path: str) -> str:
        return self.exec(f"source {{{path}}}")


def available() -> bool:
    try:
        import tkinter

        tkinter.Tcl()
        return True
    except Exception:
        return False
