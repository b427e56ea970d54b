"""Analysis registry for GUI panels (reference: optiland_gui/registry.py).

Delegates to the services-layer registry (lazy imports of the analysis
classes) and adds display names/categories for menu building.
"""

from __future__ import annotations

CATEGORIES = {
    "Rays": [
        "SpotDiagram", "ThroughFocusSpotDiagram", "RayFan", "BestFitRayFan",
        "YYbar", "PupilAberration",
    ],
    "Field": [
        "Distortion", "GridDistortion", "FieldCurvature",
        "RmsSpotSizeVsField", "RmsWavefrontErrorVsField", "MTFvsField",
    ],
    "Diffraction": [
        "FFTPSF", "HuygensPSF", "MMDFTPSF", "FFTMTF", "GeometricMTF",
    ],
    "Radiometry": ["IncoherentIrradiance", "RadiantIntensity",
                   "EncircledEnergy"],
}


def analysis_registry(connector):
    """name -> class mapping from the services layer."""
    return connector.analysis.get_analysis_registry()


def categorized(connector):
    """{category: [(name, cls), ...]} keeping only available analyses."""
    reg = analysis_registry(connector)
    out = {}
    seen = set()
    for cat, names in CATEGORIES.items():
        rows = [(n, reg[n]) for n in names if n in reg]
        if rows:
            out[cat] = rows
            seen.update(n for n, _ in rows)
    other = [(n, c) for n, c in sorted(reg.items()) if n not in seen]
    if other:
        out["Other"] = other
    return out
