"""Named material presets.

Two preset families from the reference:
* the six editor types Matte/Metal/Glossy/Glass/Paint/Custom classified
  from nonzero lobes (MaterialEditor.cxx:350-370, builders :666-1054);
* the OCCT named material gallery (Brass...UserDefined) each carrying a
  BSDF (MaterialEditor.cxx:540-613; used by `vsetmaterial` in scene
  scripts, e.g. CornellBox.tcl:29 `plastic`, :46 `glass`).

Values are our own physically-plausible interpretations of those names
(metal n/k values from standard spectral tables), not copies.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from cadrays_tpu.core.bsdf import Material, material
from cadrays_tpu.core.fresnel import (
    FRESNEL_CONDUCTOR,
    FRESNEL_CONSTANT,
    FRESNEL_DIELECTRIC,
    FRESNEL_SCHLICK,
    fresnel,
)


# -- editor-type builders (MaterialEditor semantics) -------------------------

def matte(color=(0.8, 0.8, 0.8)) -> Material:
    """CreateDiffuse analogue (MaterialEditor.cxx:666-686)."""
    return material(kd=color)


def metal(color=(0.95, 0.93, 0.88), roughness=0.05) -> Material:
    """CreateMetallic analogue (MaterialEditor.cxx:688-721): pure specular
    with Schlick F0 = color."""
    return material(kd=(0, 0, 0), ks=(1.0, 1.0, 1.0), base_rough=roughness,
                    base_fresnel=fresnel(FRESNEL_SCHLICK, color))


def glossy(diffuse=(0.5, 0.5, 0.5), specular=(0.2, 0.2, 0.2),
           roughness=0.15) -> Material:
    """Kd + Ks mix (MaterialEditor.cxx:723-783)."""
    return material(kd=diffuse, ks=specular, base_rough=roughness,
                    base_fresnel=fresnel(FRESNEL_SCHLICK, (0.04, 0.04, 0.04)))


def glass(absorp_color=(1.0, 1.0, 1.0), absorp_coeff=0.0,
          ior=1.5) -> Material:
    """CreateGlass analogue (MaterialEditor.cxx:785-831): transmission with
    Beer-Lambert absorption and dielectric Fresnel."""
    return material(kd=(0, 0, 0), kt=(1.0, 1.0, 1.0),
                    absorp_color=absorp_color, absorp_coeff=absorp_coeff,
                    base_fresnel=fresnel(FRESNEL_DIELECTRIC, ior))


def paint(base_color=(0.7, 0.1, 0.1), coat_roughness=0.0,
          coat_ior=1.5) -> Material:
    """Coat over diffuse base (MaterialEditor.cxx:833-944)."""
    return material(kd=base_color, kc=(1.0, 1.0, 1.0),
                    coat_rough=coat_roughness,
                    coat_fresnel=fresnel(FRESNEL_DIELECTRIC, coat_ior))


def emissive(radiance=(1.0, 1.0, 1.0)) -> Material:
    return material(kd=(0, 0, 0), le=radiance)


# -- OCCT-style named gallery ------------------------------------------------

def _gallery() -> Dict[str, Material]:
    g: Dict[str, Material] = {}
    g["default"] = glossy((0.65, 0.65, 0.65), (0.15, 0.15, 0.15), 0.25)
    g["plastic"] = glossy((0.6, 0.6, 0.6), (0.18, 0.18, 0.18), 0.12)
    g["shiny_plastic"] = glossy((0.55, 0.55, 0.55), (0.35, 0.35, 0.35), 0.03)
    g["plaster"] = matte((0.75, 0.73, 0.70))
    g["plasterwhite"] = matte((0.9, 0.9, 0.9))
    g["glass"] = glass()
    g["diamond"] = glass(ior=2.42)
    g["water"] = glass(ior=1.33)
    g["transparent"] = glass(ior=1.0)
    # conductors: (n, k) at ~550nm, grayscale; tint via ks color
    def conductor(tint, n, k, rough):
        return material(kd=(0, 0, 0), ks=tint, base_rough=rough,
                        base_fresnel=fresnel(FRESNEL_CONDUCTOR, n, k))

    g["brass"] = conductor((0.90, 0.75, 0.35), 0.44, 3.0, 0.08)
    g["bronze"] = conductor((0.8, 0.55, 0.35), 0.45, 3.0, 0.1)
    g["copper"] = conductor((0.95, 0.64, 0.54), 0.46, 2.8, 0.05)
    g["gold"] = conductor((1.0, 0.77, 0.35), 0.27, 2.78, 0.05)
    g["silver"] = conductor((0.97, 0.96, 0.92), 0.15, 3.47, 0.04)
    g["aluminium"] = conductor((0.91, 0.92, 0.92), 1.35, 7.47, 0.1)
    g["chrome"] = conductor((0.68, 0.68, 0.70), 3.2, 3.3, 0.03)
    g["steel"] = conductor((0.62, 0.62, 0.64), 2.9, 3.0, 0.15)
    g["metalized"] = metal((0.8, 0.8, 0.85), 0.2)
    g["pewter"] = conductor((0.55, 0.55, 0.58), 1.8, 3.0, 0.25)
    g["charcoal"] = matte((0.04, 0.04, 0.04))
    g["obsidian"] = material(kd=(0.05, 0.04, 0.06), ks=(0.3, 0.3, 0.3),
                             base_rough=0.05)
    g["jade"] = material(kd=(0.25, 0.55, 0.35), kc=(1, 1, 1), coat_rough=0.1,
                         coat_fresnel=fresnel(FRESNEL_DIELECTRIC, 1.5))
    g["ruby"] = material(kd=(0.45, 0.05, 0.08), kc=(1, 1, 1), coat_rough=0.0,
                         coat_fresnel=fresnel(FRESNEL_DIELECTRIC, 1.76))
    g["neon_gnc"] = emissive((1.0, 1.0, 1.0))
    g["neon_phc"] = emissive((0.71, 1.0, 0.88))
    g["pbr"] = glossy()
    g["uo2"] = glossy((0.1, 0.1, 0.1), (0.2, 0.2, 0.2), 0.3)
    g["user_defined"] = glossy()
    # satin / shiny surfaces
    g["satin"] = material(kd=(0.55, 0.4, 0.45), ks=(0.25, 0.2, 0.22),
                          base_rough=0.35)
    g["stone"] = matte((0.58, 0.54, 0.50))
    return g


_PRESETS = _gallery()


def preset(name: str) -> Material:
    """Look up a named material (case-insensitive); KeyError if unknown."""
    key = name.lower()
    if key not in _PRESETS:
        raise KeyError(f"unknown material preset '{name}' "
                       f"(available: {', '.join(sorted(_PRESETS))})")
    return _PRESETS[key]


def preset_names():
    return sorted(_PRESETS)


def classify(m: Material) -> str:
    """Editor-type classification from nonzero lobes
    (MaterialEditor.cxx:350-370)."""
    kd = float(np.asarray(m.kd).max())
    ks = float(np.asarray(m.ks).max())
    kt = float(np.asarray(m.kt).max())
    kc = float(np.asarray(m.kc).max())
    if kt > 0 and kd == 0 and ks == 0:
        return "glass"
    if kc > 0 and kt == 0:
        return "paint"
    if kd > 0 and ks == 0 and kt == 0 and kc == 0:
        return "matte"
    if kd == 0 and ks > 0 and kt == 0 and kc == 0:
        return "metal"
    if kd > 0 and ks > 0 and kt == 0 and kc == 0:
        return "glossy"
    return "custom"
