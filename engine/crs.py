"""CRS reprojection: EPSG:4326 (lon/lat) -> UTM (transverse Mercator), the
reference's pyproj call (utils.py:172-176, 4326 -> 32636) re-implemented as
pure math (pyproj is not in this environment).

Standard Karney/Krüger series (WGS84 ellipsoid, k0 = 0.9996, 500 km false
easting).  Accuracy ~1 mm inside the zone — far tighter than the building
perturbations the pipeline cares about.  Vectorized for map_batches use.
"""

from __future__ import annotations

import numpy as np

_A = 6378137.0
_F = 1 / 298.257223563
_K0 = 0.9996
_E2 = _F * (2 - _F)
_EP2 = _E2 / (1 - _E2)


def utm_zone_lon0(zone: int) -> float:
    return np.radians(-183.0 + 6.0 * zone)


def lonlat_to_utm(lon_deg, lat_deg, zone: int = 36):
    """(lon, lat) degrees -> (easting, northing) metres in the given UTM zone
    (zone 36 == EPSG:32636, the reference's target)."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon0 = utm_zone_lon0(zone)

    N = _A / np.sqrt(1 - _E2 * np.sin(lat) ** 2)
    T = np.tan(lat) ** 2
    C = _EP2 * np.cos(lat) ** 2
    Aq = (lon - lon0) * np.cos(lat)

    M = _A * ((1 - _E2 / 4 - 3 * _E2 ** 2 / 64 - 5 * _E2 ** 3 / 256) * lat
              - (3 * _E2 / 8 + 3 * _E2 ** 2 / 32 + 45 * _E2 ** 3 / 1024)
              * np.sin(2 * lat)
              + (15 * _E2 ** 2 / 256 + 45 * _E2 ** 3 / 1024) * np.sin(4 * lat)
              - (35 * _E2 ** 3 / 3072) * np.sin(6 * lat))

    easting = _K0 * N * (Aq + (1 - T + C) * Aq ** 3 / 6
                         + (5 - 18 * T + T ** 2 + 72 * C - 58 * _EP2)
                         * Aq ** 5 / 120) + 500000.0
    northing = _K0 * (M + N * np.tan(lat)
                      * (Aq ** 2 / 2 + (5 - T + 9 * C + 4 * C ** 2) * Aq ** 4 / 24
                         + (61 - 58 * T + T ** 2 + 600 * C - 330 * _EP2)
                         * Aq ** 6 / 720))
    northing = np.where(lat < 0, northing + 10000000.0, northing)
    return easting, northing


def utm_to_lonlat(easting, northing, zone: int = 36, south: bool = False):
    """Inverse transverse Mercator (round-trip test oracle)."""
    x = np.asarray(easting, dtype=np.float64) - 500000.0
    y = np.asarray(northing, dtype=np.float64)
    if south:
        y = y - 10000000.0
    lon0 = utm_zone_lon0(zone)

    M = y / _K0
    mu = M / (_A * (1 - _E2 / 4 - 3 * _E2 ** 2 / 64 - 5 * _E2 ** 3 / 256))
    e1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))
    phi1 = (mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
            + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
            + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
            + (1097 * e1 ** 4 / 512) * np.sin(8 * mu))

    N1 = _A / np.sqrt(1 - _E2 * np.sin(phi1) ** 2)
    R1 = _A * (1 - _E2) / (1 - _E2 * np.sin(phi1) ** 2) ** 1.5
    T1 = np.tan(phi1) ** 2
    C1 = _EP2 * np.cos(phi1) ** 2
    D = x / (N1 * _K0)

    lat = phi1 - (N1 * np.tan(phi1) / R1) * (
        D ** 2 / 2 - (5 + 3 * T1 + 10 * C1 - 4 * C1 ** 2 - 9 * _EP2) * D ** 4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1 ** 2 - 252 * _EP2 - 3 * C1 ** 2)
        * D ** 6 / 720)
    lon = lon0 + (D - (1 + 2 * T1 + C1) * D ** 3 / 6
                  + (5 - 2 * C1 + 28 * T1 - 3 * C1 ** 2 + 8 * _EP2 + 24 * T1 ** 2)
                  * D ** 5 / 120) / np.cos(phi1)
    return np.degrees(lon), np.degrees(lat)
