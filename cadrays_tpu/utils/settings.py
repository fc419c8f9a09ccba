"""Persistent INI settings (reference src/Utils/Settings.cxx:22-151).

Typed get/set over sections; `dump()` writes the file back. Used for the
same things the reference persists: last render mode, view size, last
used paths (AppGui.cxx:113-116, SettingsWidget.cxx:54-91).
"""
from __future__ import annotations

import configparser
import os
from typing import Optional


class Settings:
    def __init__(self, path: Optional[str] = None):
        self.path = path or os.path.join(
            os.path.expanduser("~"), ".cadrays_tpu", "settings.ini")
        self._cp = configparser.ConfigParser()
        if os.path.exists(self.path):
            self._cp.read(self.path)

    def get(self, section: str, key: str, default: str = "") -> str:
        return self._cp.get(section, key, fallback=default)

    def get_int(self, section: str, key: str, default: int = 0) -> int:
        return self._cp.getint(section, key, fallback=default)

    def get_float(self, section: str, key: str, default: float = 0.0) -> float:
        return self._cp.getfloat(section, key, fallback=default)

    def get_bool(self, section: str, key: str, default: bool = False) -> bool:
        return self._cp.getboolean(section, key, fallback=default)

    def set(self, section: str, key: str, value) -> None:
        if not self._cp.has_section(section):
            self._cp.add_section(section)
        self._cp.set(section, key, str(value))

    def dump(self) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(self.path, "w") as f:
            self._cp.write(f)
