"""Glass-map utilities for categorical glass optimization.

(reference: optiland/materials/material_utils.py:73-260 get_nd_vd,
downsample_glass_map, get_neighbour_glasses, plot_glass_map)
"""

from __future__ import annotations

import warnings

import numpy as np


def get_nd_vd(glass: str) -> tuple[float, float]:
    """(n_d, V_d) of a catalog glass; computed from the dispersion model
    when the catalog SPECS are absent (reference: material_utils.py:73-99)."""
    from optiland_tpu.materials import Material

    m = Material(glass)
    nd, vd = float(getattr(m, "nd", np.nan)), float(getattr(m, "vd", np.nan))
    if np.isnan(nd) or np.isnan(vd):
        n_F = float(np.ravel(np.asarray(m.n(0.4861327)))[0])
        n_d = float(np.ravel(np.asarray(m.n(0.5875618)))[0])
        n_C = float(np.ravel(np.asarray(m.n(0.6562725)))[0])
        nd = n_d
        denom = n_F - n_C
        vd = 0.0 if abs(denom) < 1e-12 else (n_d - 1.0) / denom
    return nd, vd


def find_closest_glass(nd_vd: tuple[float, float], catalog: list[str]) -> str:
    """Catalog glass nearest to (n_d, V_d)
    (reference: material_utils.py find_closest_glass)."""
    target = np.asarray(nd_vd, float)
    best, best_d = None, np.inf
    for name in catalog:
        d = float(np.linalg.norm(np.asarray(get_nd_vd(name)) - target))
        if d < best_d:
            best, best_d = name, d
    return best


def downsample_glass_map(glass_dict: dict, num_glasses_to_keep: int) -> dict:
    """K-Means downsampling in (n_d, V_d) space: keep the glass closest to
    each cluster centroid (reference: material_utils.py:102-187)."""
    from scipy.cluster.vq import kmeans2

    assert num_glasses_to_keep <= len(glass_dict), (
        "Cannot keep more glasses than available in the input dictionary."
    )
    assert num_glasses_to_keep > 1, "Must retain at least 2 glasses."
    names = list(glass_dict.keys())
    data = np.asarray([glass_dict[n] for n in names], float)
    centroids, labels = kmeans2(
        data, num_glasses_to_keep, minit="points", seed=1234
    )
    if len(set(labels)) < num_glasses_to_keep:
        warnings.warn(
            f"In downsample_glass_map(): K-Means produced only "
            f"{len(set(labels))} clusters out of {num_glasses_to_keep} "
            "requested. Some clusters may be empty and fewer glasses will "
            "be selected.",
            UserWarning, stacklevel=2,
        )
    selected = {}
    for c in range(num_glasses_to_keep):
        idxs = np.nonzero(labels == c)[0]
        if idxs.size == 0:
            continue
        d = np.linalg.norm(data[idxs] - centroids[c], axis=1)
        name = names[int(idxs[int(np.argmin(d))])]
        selected[name] = glass_dict[name]
    return selected


def get_neighbour_glasses(glass: str, glass_selection=None, glass_dict=None,
                          num_neighbours: int = 3, plot: bool = False):
    """The ``num_neighbours`` closest glasses in (n_d, V_d) space
    (reference: material_utils.py:190-250)."""
    if not glass_selection and not glass_dict:
        raise ValueError(
            "Either glass_selection or glass_dict must be provided."
        )
    if glass_dict is None:
        glass_dict = {g: get_nd_vd(g) for g in glass_selection}
    ref = np.asarray(
        glass_dict.get(glass) if glass in glass_dict else get_nd_vd(glass),
        float,
    )
    others = [(n, v) for n, v in glass_dict.items() if n != glass]
    others.sort(key=lambda nv: float(np.linalg.norm(np.asarray(nv[1]) - ref)))
    neighbours = [n for n, _ in others[:num_neighbours]]
    if plot:
        plot_glass_map(
            glass_selection=list(glass_dict.keys()), highlights=neighbours,
            title=f"Nearest neighbours of {glass}",
        )
    return neighbours


def plot_glass_map(glass_selection, highlights=(), title="Glass map", ax=None):
    """Scatter the selection in (V_d, n_d) space (Abbe diagram)."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    for name in glass_selection:
        nd, vd = get_nd_vd(name)
        hl = name in highlights
        ax.scatter(vd, nd, c="C3" if hl else "C0", s=30 if hl else 12)
        if hl:
            ax.annotate(name, (vd, nd), fontsize=7)
    ax.invert_xaxis()
    ax.set_xlabel("Abbe number $V_d$")
    ax.set_ylabel("Refractive index $n_d$")
    ax.set_title(title)
    return ax
