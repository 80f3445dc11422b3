"""DGGS configuration: presets, validation, orientation.

Replaces the reference's metafile IR entirely (the reference builds
`parameter value` text lines for the DGGRID CLI — dggrid_runner.py:496-511 —
and validates preset/aperture/topology combos in `dgselect`
:378-493 / `specify_topo_aperture` :2100-2183 / `specify_orient_type_args`
:2058-2097 / `specify_resolution` :2186-2228).  Here the same vocabulary
resolves to a frozen dataclass that parameterizes the in-process kernels.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

# preset name -> (projection, aperture, topology)   (reference dgselect
# tables, dggrid_runner.py:378-493; DggsTypeT vocabulary :67-84)
DGGS_TYPES = {
    "ISEA3H": ("ISEA", 3, "HEXAGON"),
    "ISEA4H": ("ISEA", 4, "HEXAGON"),
    "ISEA4T": ("ISEA", 4, "TRIANGLE"),
    "ISEA4D": ("ISEA", 4, "DIAMOND"),
    "ISEA43H": ("ISEA", 43, "HEXAGON"),
    "ISEA7H": ("ISEA", 7, "HEXAGON"),
    "IGEO7": ("ISEA", 7, "HEXAGON"),
    "FULLER3H": ("FULLER", 3, "HEXAGON"),
    "FULLER4H": ("FULLER", 4, "HEXAGON"),
    "FULLER4T": ("FULLER", 4, "TRIANGLE"),
    "FULLER4D": ("FULLER", 4, "DIAMOND"),
    "FULLER43H": ("FULLER", 43, "HEXAGON"),
    "PLANETRISK": ("ISEA", 43, "HEXAGON"),
    "SUPERFUND": ("FULLER", 43, "HEXAGON"),
}

VALID_APERTURES = {"HEXAGON": {3, 4, 7, 43}, "TRIANGLE": {4}, "DIAMOND": {4}}

# address types (union of the v7 and v8 vocabularies; reference
# DggsOutputAddressTypeV7T :121-137 and v8 HIERNDX forms :141-184)
ADDRESS_TYPES = {
    "GEO", "SEQNUM", "Z7", "Z7_STRING", "Z7_HEX", "Q2DI", "Q2DD", "PROJTRI",
    "ZORDER", "ZORDER_STRING", "Z3", "Z3_STRING", "PLANE", "VERTEX2DD",
}

DEFAULT_POLE_LON = 11.25
DEFAULT_POLE_LAT = 58.28252559  # reference Dggs defaults, dggrid_runner.py:530-532
DEFAULT_AZIMUTH = 0.0


@dataclass(frozen=True)
class Dggs:
    """Frozen grid-system definition; serialized into Ray actor constructors.

    Mirrors the reference `Dggs` dataclass (dggrid_runner.py:514-620) minus
    the metafile machinery.
    """

    dggs_type: str = "IGEO7"
    projection: str = "ISEA"
    aperture: int = 7
    topology: str = "HEXAGON"
    resolution: int = 9
    pole_lon_deg: float = DEFAULT_POLE_LON
    pole_lat_deg: float = DEFAULT_POLE_LAT
    azimuth_deg: float = DEFAULT_AZIMUTH
    precision: int = 7                      # output decimal digits (reference :521)
    mixed_aperture_level: int | None = None  # ISEA43H: #levels of aperture 4

    def with_resolution(self, res: int) -> "Dggs":
        return replace(self, resolution=res)


def dgselect(dggs_type: str = "IGEO7", resolution: int = 9,
             mixed_aperture_level: int | None = None, pole_lon_deg: float | None = None,
             pole_lat_deg: float | None = None, azimuth_deg: float | None = None,
             **kwargs) -> Dggs:
    """Preset-name constructor (reference dgselect, dggrid_runner.py:378-493).

    CUSTOM grids raise NotImplementedError exactly like the reference (:489).
    """
    t = dggs_type.upper()
    if t == "CUSTOM":
        raise NotImplementedError("CUSTOM dggs_type not supported (reference parity: dggrid_runner.py:489)")
    if t not in DGGS_TYPES:
        raise ValueError(f"unknown dggs_type {dggs_type!r}; one of {sorted(DGGS_TYPES)}")
    proj, aperture, topo = DGGS_TYPES[t]
    if aperture == 43 and mixed_aperture_level is None:
        mixed_aperture_level = {"PLANETRISK": 11, "SUPERFUND": 9}.get(t, 7)
    if aperture not in VALID_APERTURES[topo] and aperture != 43:
        raise ValueError(f"aperture {aperture} invalid for topology {topo}")
    if resolution < 0:
        raise ValueError("resolution must be >= 0")
    pole_lon = DEFAULT_POLE_LON if pole_lon_deg is None else float(pole_lon_deg)
    pole_lat = DEFAULT_POLE_LAT if pole_lat_deg is None else float(pole_lat_deg)
    az = DEFAULT_AZIMUTH if azimuth_deg is None else float(azimuth_deg)
    if not (-180.0 <= pole_lon <= 180.0 and -90.0 <= pole_lat <= 90.0 and 0.0 <= az < 360.0):
        raise ValueError("orientation out of range (reference specify_orient_type_args, :2058-2097)")
    return Dggs(dggs_type=t, projection=proj, aperture=aperture, topology=topo,
                resolution=resolution, pole_lon_deg=pole_lon, pole_lat_deg=pole_lat,
                azimuth_deg=az, mixed_aperture_level=mixed_aperture_level,
                precision=int(kwargs.get("precision", 7)))


def dgconstruct(res: int | None = None, area_km2: float | None = None,
                spacing_km: float | None = None, cls_km: float | None = None,
                dggs_type: str = "IGEO7", round_down: bool = True, **kwargs) -> Dggs:
    """R-style constructor: exactly one of res/area/spacing/cls (reference
    dgconstruct, dggrid_runner.py:2231-2277 — whose closest-res helpers were
    'not yet implemented' (:613-620); implemented here for real)."""
    given = [v is not None for v in (res, area_km2, spacing_km, cls_km)]
    if sum(given) != 1:
        raise ValueError("dgconstruct: specify exactly one of res / area_km2 / spacing_km / cls_km")
    from .dggs import stats
    proj, aperture, topo = DGGS_TYPES[dggs_type.upper()]
    if res is None:
        if area_km2 is not None:
            res = stats.res_for_cell_area(area_km2, aperture if aperture != 43 else 4, topo, round_down)
        else:
            target = spacing_km if spacing_km is not None else cls_km
            res = stats.res_for_intercell_distance(target, aperture if aperture != 43 else 4, topo, round_down)
    return dgselect(dggs_type, resolution=int(res), **kwargs)
