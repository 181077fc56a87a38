"""Vectorized metric kernels + registry (SURVEY §2.4 A1-A15, §2.10).

Each kernel is a pure numpy function ``(cube: (S, h, w) float array, **params)
-> (h, w) array`` — the Spark-side analogue of the reference's
ForestCalculation plugins (/root/reference/gridfia/core/calculations/*,
registry at core/calculations/registry.py:27-56). All kernels for a tile run
in ONE shared ``applyInPandas`` pass (multi-metric per scan, mirroring
forest_metrics.py:410-423).

dtype contract: kernels compute in float64 by default so results are exactly
reproducible by a float64 SQL oracle; ``parity32=True`` reproduces the
reference's float32 arithmetic bit-for-bit for golden-value tests.

Scope subtlety (SURVEY §3.1): rare/common/dominance frequencies are relative
to the *array passed in* — per-tile when run in the tile kernel pass
(bit-matching the reference's per-chunk behavior), global when run through
operators/metrics.py's two-phase aggregate path.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

Kernel = Callable[..., np.ndarray]
_REGISTRY: dict[str, Kernel] = {}


def register(name: str) -> Callable[[Kernel], Kernel]:
    def deco(fn: Kernel) -> Kernel:
        _REGISTRY[name] = fn
        return fn

    return deco


def get(name: str) -> Kernel:
    return _REGISTRY[name]


def list_kernels() -> list[str]:
    return sorted(_REGISTRY)


def unregister(name: str) -> None:
    _REGISTRY.pop(name, None)


def _species(cube: np.ndarray) -> np.ndarray:
    """Drop the precomputed total layer (index 0) — diversity.py:45-47."""
    return cube[1:] if cube.shape[0] > 1 else cube


def _f(cube: np.ndarray, parity32: bool) -> type:
    return np.float32 if parity32 else np.float64


# --------------------------------------------------------------- A1 richness
@register("species_richness")
def species_richness(
    cube: np.ndarray, biomass_threshold: float = 0.0, parity32: bool = False
) -> np.ndarray:
    """diversity.py:40-50: count_nonzero(species > t, axis=0). uint8."""
    return np.count_nonzero(_species(cube) > biomass_threshold, axis=0).astype(
        np.uint8
    )


# ---------------------------------------------------------------- A2 shannon
@register("shannon_diversity")
def shannon_diversity(
    cube: np.ndarray, base: str = "e", parity32: bool = False
) -> np.ndarray:
    """diversity.py:82-126: H' = -sum p_i log p_i, 0 where total==0,
    contributions only for p_i > 0 (no epsilon — the canonical behavior pinned
    by tests/unit/test_diversity_calculations.py:146)."""
    ftype = _f(cube, parity32)
    sp = _species(cube).astype(ftype)
    total = sp.sum(axis=0)
    out = np.zeros(sp.shape[1:], dtype=ftype)
    valid = total > 0
    if valid.any():
        p = np.zeros_like(sp)
        p[:, valid] = sp[:, valid] / total[valid]
        log = np.log2 if base == "2" else np.log
        mask = p > 0
        contrib = np.zeros_like(p)
        contrib[mask] = -p[mask] * log(p[mask])
        out = contrib.sum(axis=0)
    return out


# ---------------------------------------------------------------- A3 simpson
@register("simpson_diversity")
def simpson_diversity(
    cube: np.ndarray, inverse: bool = True, parity32: bool = False
) -> np.ndarray:
    """diversity.py:155-197: D = sum p_i^2; 1/D if inverse (1 where D==0)."""
    ftype = _f(cube, parity32)
    sp = _species(cube).astype(ftype)
    total = sp.sum(axis=0)
    simpson = np.zeros(sp.shape[1:], dtype=ftype)
    valid = total > 0
    if valid.any():
        p = np.zeros_like(sp)
        p[:, valid] = sp[:, valid] / total[valid]
        simpson = (p**2).sum(axis=0)
        if inverse:
            mask = simpson > 0
            res = np.ones_like(simpson)
            res[mask] = 1.0 / simpson[mask]
            simpson = res
    return simpson


# --------------------------------------------------------------- A4 evenness
@register("evenness")
def evenness(cube: np.ndarray, parity32: bool = False) -> np.ndarray:
    """diversity.py:223-250: Pielou J = H'/ln(S), only where richness > 1."""
    h = shannon_diversity(cube, parity32=parity32)
    s = species_richness(cube)
    out = np.zeros_like(h)
    mask = s > 1
    if mask.any():
        out[mask] = h[mask] / np.log(s[mask].astype(_f(cube, parity32)))
    return out


# ----------------------------------------------------------- A5 total biomass
@register("total_biomass")
def total_biomass(cube: np.ndarray, parity32: bool = False) -> np.ndarray:
    """biomass.py:37-48: sum over species layers (excl. precomputed total)."""
    return _species(cube).astype(_f(cube, parity32)).sum(axis=0)


# ------------------------------------------------- A6 total comparison
@register("total_biomass_comparison")
def total_biomass_comparison(cube: np.ndarray, parity32: bool = False) -> np.ndarray:
    """biomass.py:74-85: |precomputed_total - sum(species)|; NaN if <=1 layer."""
    ftype = _f(cube, parity32)
    if cube.shape[0] <= 1:
        return np.full(cube.shape[1:], np.nan, dtype=ftype)
    return np.abs(
        cube[0].astype(ftype) - cube[1:].astype(ftype).sum(axis=0)
    )


# ------------------------------------------------------ A7/A8 proportion/pct
@register("species_proportion")
def species_proportion(
    cube: np.ndarray, species_index: int, parity32: bool = False
) -> np.ndarray:
    """biomass.py:120-141: b_i / sum(species), 0 where total==0; idx 0 invalid."""
    if species_index == 0:
        raise ValueError("Cannot calculate proportion for total layer (index 0)")
    ftype = _f(cube, parity32)
    sp = cube[species_index].astype(ftype)
    total = cube[1:].astype(ftype).sum(axis=0)
    out = np.zeros_like(sp)
    mask = total > 0
    out[mask] = sp[mask] / total[mask]
    return out


@register("species_percentage")
def species_percentage(
    cube: np.ndarray, species_index: int, parity32: bool = False
) -> np.ndarray:
    """biomass.py:170-173: proportion * 100."""
    return species_proportion(cube, species_index, parity32) * 100.0


# ------------------------------------------------- A9 group proportion
@register("species_group_proportion")
def species_group_proportion(
    cube: np.ndarray, species_indices: list[int], parity32: bool = False
) -> np.ndarray:
    """biomass.py:199-219: sum(b[group]) / sum(species)."""
    for idx in species_indices:
        if idx >= cube.shape[0] or idx == 0:
            raise ValueError(f"Invalid species index: {idx}")
    ftype = _f(cube, parity32)
    grp = cube[species_indices].astype(ftype).sum(axis=0)
    total = cube[1:].astype(ftype).sum(axis=0)
    out = np.zeros_like(grp)
    mask = total > 0
    out[mask] = grp[mask] / total[mask]
    return out


# ------------------------------------------------------ A10 threshold
@register("biomass_threshold")
def biomass_threshold(
    cube: np.ndarray, threshold: float, above: bool = True, parity32: bool = False
) -> np.ndarray:
    """biomass.py:257-270: (total > t) or (total <= t) as uint8."""
    total = total_biomass(cube, parity32)
    return (total > threshold if above else total <= threshold).astype(np.uint8)


# ------------------------------------------------------ A11 dominant
@register("dominant_species")
def dominant_species(
    cube: np.ndarray, min_biomass: float = 0.0, parity32: bool = False
) -> np.ndarray:
    """species.py:40-63: argmax over species (+1 offset for excluded total),
    0 where max <= min_biomass. Ties: first species wins (np.argmax)."""
    sp = _species(cube)
    offset = 1 if cube.shape[0] > 1 else 0
    mx = sp.max(axis=0)
    dom = np.argmax(sp, axis=0)
    out = np.zeros(dom.shape, dtype=np.uint8)
    mask = mx > min_biomass
    out[mask] = dom[mask] + offset
    return out


# ------------------------------------------------------ A12 presence
@register("species_presence")
def species_presence(
    cube: np.ndarray, species_index: int, threshold: float = 0.0, parity32: bool = False
) -> np.ndarray:
    """species.py:105-114: (b_i > t) as uint8."""
    return (cube[species_index] > threshold).astype(np.uint8)


# ------------------------------------------------------ A13 dominance
@register("species_dominance")
def species_dominance(
    cube: np.ndarray, species_index: int, parity32: bool = False
) -> np.ndarray:
    """species.py:153-176: % of pixels (of THIS array) where species i is
    dominant, broadcast to the full shape. Scope = the passed array."""
    if species_index == 0:
        raise ValueError(f"Invalid species index: {species_index}")
    dom = dominant_species(cube)
    pct = float((dom == species_index).sum()) / dom.size * 100.0
    return np.full(dom.shape, pct, dtype=_f(cube, parity32))


# ------------------------------------------------- A14/A15 rare/common
def _occurrence_count(cube: np.ndarray, biomass_threshold: float, freq_mask: np.ndarray) -> np.ndarray:
    sp = _species(cube)
    count = np.zeros(sp.shape[1:], dtype=np.uint8)
    for i in range(sp.shape[0]):
        if freq_mask[i]:
            count += (sp[i] > biomass_threshold).astype(np.uint8)
    return count


def occurrence_freq(cube: np.ndarray, biomass_threshold: float = 0.0) -> np.ndarray:
    """Per-species occurrence frequency over the passed array
    (species.py:218-226). Exposed separately so the distributed global-scope
    path can aggregate it across tiles (partial counts -> final freq)."""
    sp = _species(cube)
    n = sp.shape[1] * sp.shape[2]
    return np.array([(sp[i] > biomass_threshold).sum() / n for i in range(sp.shape[0])])


@register("rare_species")
def rare_species(
    cube: np.ndarray,
    occurrence_threshold: float = 0.01,
    biomass_threshold: float = 0.0,
    freq: np.ndarray | None = None,
    parity32: bool = False,
) -> np.ndarray:
    """species.py:207-234: count of species with occurrence freq < threshold
    present per pixel. ``freq`` may be injected for global scope."""
    f = freq if freq is not None else occurrence_freq(cube, biomass_threshold)
    return _occurrence_count(cube, biomass_threshold, f < occurrence_threshold)


@register("common_species")
def common_species(
    cube: np.ndarray,
    occurrence_threshold: float = 0.10,
    biomass_threshold: float = 0.0,
    freq: np.ndarray | None = None,
    parity32: bool = False,
) -> np.ndarray:
    """species.py:267-294: count of species with freq >= threshold per pixel."""
    f = freq if freq is not None else occurrence_freq(cube, biomass_threshold)
    return _occurrence_count(cube, biomass_threshold, f >= occurrence_threshold)
