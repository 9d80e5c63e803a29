"""Pure-numpy CRS projection kernels (pyproj replacement).

The reference reprojects any geographic input to a projected CRS before
metric math (M2, ``accessibility.py:40-50``; default EPSG:3395 at
``availability.py:66-70``) and converts bboxes back to WGS84 for remote
catalog queries (M8, ``availability.py:76-77``).  The sandbox has no
pyproj, so the two projections the reference actually uses are
implemented from the public closed forms over float64 arrays:

* **EPSG:3395** (World Mercator, WGS84 ellipsoid) — Snyder, *Map
  Projections: A Working Manual* (USGS PP 1395), eqs. 7-6..7-10.
* **UTM / Transverse Mercator** — the Krüger n-series (6th order) as in
  Karney 2011, *Transverse Mercator with an accuracy of a few
  nanometers* (public algorithm; also OSGB/Redfearn lineage).

Everything is vectorized; a "CRS" here is one of the string tags
``"EPSG:4326"`` (geographic degrees), ``"EPSG:3395"``, or
``"UTM:<zone><N|S>"`` (e.g. ``"UTM:31N"``).
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_E = np.sqrt(_E2)
# third flattening and Krüger series constants (Karney 2011, eq. 12/35)
_N = _F / (2.0 - _F)
_N2 = _N * _N
# rectifying radius A1 = a/(1+n) (1 + n²/4 + n⁴/64 + ...)
_A1 = _A / (1.0 + _N) * (1.0 + _N2 / 4.0 + _N2 * _N2 / 64.0)
# forward coefficients alpha_j (j=1..6)
_ALPHA = np.array([
    _N / 2.0 - 2.0 / 3.0 * _N2 + 5.0 / 16.0 * _N**3 + 41.0 / 180.0 * _N**4
    - 127.0 / 288.0 * _N**5 + 7891.0 / 37800.0 * _N**6,
    13.0 / 48.0 * _N2 - 3.0 / 5.0 * _N**3 + 557.0 / 1440.0 * _N**4
    + 281.0 / 630.0 * _N**5 - 1983433.0 / 1935360.0 * _N**6,
    61.0 / 240.0 * _N**3 - 103.0 / 140.0 * _N**4 + 15061.0 / 26880.0 * _N**5
    + 167603.0 / 181440.0 * _N**6,
    49561.0 / 161280.0 * _N**4 - 179.0 / 168.0 * _N**5
    + 6601661.0 / 7257600.0 * _N**6,
    34729.0 / 80640.0 * _N**5 - 3418889.0 / 1995840.0 * _N**6,
    212378941.0 / 319334400.0 * _N**6,
])
# inverse coefficients beta_j
_BETA = np.array([
    _N / 2.0 - 2.0 / 3.0 * _N2 + 37.0 / 96.0 * _N**3 - 1.0 / 360.0 * _N**4
    - 81.0 / 512.0 * _N**5 + 96199.0 / 604800.0 * _N**6,
    1.0 / 48.0 * _N2 + 1.0 / 15.0 * _N**3 - 437.0 / 1440.0 * _N**4
    + 46.0 / 105.0 * _N**5 - 1118711.0 / 3870720.0 * _N**6,
    17.0 / 480.0 * _N**3 - 37.0 / 840.0 * _N**4 - 209.0 / 4480.0 * _N**5
    + 5569.0 / 90720.0 * _N**6,
    4397.0 / 161280.0 * _N**4 - 11.0 / 504.0 * _N**5
    - 830251.0 / 7257600.0 * _N**6,
    4583.0 / 161280.0 * _N**5 - 108847.0 / 3991680.0 * _N**6,
    20648693.0 / 638668800.0 * _N**6,
])

_UTM_K0 = 0.9996
_UTM_FE = 500000.0
_UTM_FN_S = 10000000.0


# ---------------------------------------------------------------------------
# EPSG:3395 — World Mercator (ellipsoidal)
# ---------------------------------------------------------------------------


def mercator_forward(lon_deg, lat_deg):
    """(lon, lat) degrees → EPSG:3395 (x, y) meters."""
    lon = np.deg2rad(np.asarray(lon_deg, np.float64))
    lat = np.deg2rad(np.asarray(lat_deg, np.float64))
    x = _A * lon
    s = np.sin(lat)
    y = _A * (np.arctanh(s) - _E * np.arctanh(_E * s))
    return x, y


def mercator_inverse(x, y):
    """EPSG:3395 (x, y) meters → (lon, lat) degrees (Newton on the
    isometric latitude; converges quadratically, 6 iters ≈ machine eps)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    lon = x / _A
    psi = y / _A  # isometric latitude
    # initial guess: spherical
    lat = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
    for _ in range(6):
        s = np.sin(lat)
        f = np.arctanh(s) - _E * np.arctanh(_E * s) - psi
        df = 1.0 / (1.0 - s * s) * np.cos(lat) - _E * _E * np.cos(lat) / (
            1.0 - _E2 * s * s)
        lat = lat - f / df
    return np.rad2deg(lon), np.rad2deg(lat)


# ---------------------------------------------------------------------------
# UTM — transverse Mercator, Krüger series
# ---------------------------------------------------------------------------


def _tm_forward(lon, lat, lon0):
    """Transverse Mercator core: radians in → unscaled (ξ·A1, η·A1)."""
    s = np.sin(lat)
    # conformal latitude (Karney eq. 7-9)
    t = np.sinh(np.arctanh(s) - _E * np.arctanh(_E * s))
    xi_p = np.arctan2(t, np.cos(lon - lon0))
    eta_p = np.arcsinh(np.sin(lon - lon0) / np.hypot(t, np.cos(lon - lon0)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi = xi + _ALPHA[j] * np.sin(k * xi_p) * np.cosh(k * eta_p)
        eta = eta + _ALPHA[j] * np.cos(k * xi_p) * np.sinh(k * eta_p)
    return _A1 * eta, _A1 * xi  # (easting-ish, northing-ish)


def _tm_inverse(x, y, lon0):
    xi = y / _A1
    eta = x / _A1
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi_p = xi_p - _BETA[j] * np.sin(k * xi) * np.cosh(k * eta)
        eta_p = eta_p - _BETA[j] * np.cos(k * xi) * np.sinh(k * eta)
    t = np.sinh(eta_p)
    lon = lon0 + np.arctan2(t, np.cos(xi_p))
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))  # conformal latitude
    # conformal → geographic latitude: Newton on the isometric latitude
    # (both latitudes share it: psi(lat) = arctanh(sin chi))
    psi = np.arctanh(np.sin(chi))
    lat = chi.copy()
    for _ in range(6):
        s = np.sin(lat)
        f = np.arctanh(s) - _E * np.arctanh(_E * s) - psi
        df = np.cos(lat) / (1.0 - s * s) - _E2 * np.cos(lat) / (1.0 - _E2 * s * s)
        lat = lat - f / df
    return lon, lat


def utm_forward(lon_deg, lat_deg, zone: int, south: bool = False):
    """(lon, lat) degrees → UTM (easting, northing) meters for ``zone``."""
    lon = np.deg2rad(np.asarray(lon_deg, np.float64))
    lat = np.deg2rad(np.asarray(lat_deg, np.float64))
    lon0 = np.deg2rad(zone * 6.0 - 183.0)
    ex, ny = _tm_forward(lon, lat, lon0)
    e = _UTM_K0 * ex + _UTM_FE
    n = _UTM_K0 * ny + (_UTM_FN_S if south else 0.0)
    return e, n


def utm_inverse(easting, northing, zone: int, south: bool = False):
    x = (np.asarray(easting, np.float64) - _UTM_FE) / _UTM_K0
    y = (np.asarray(northing, np.float64)
         - (_UTM_FN_S if south else 0.0)) / _UTM_K0
    lon0 = np.deg2rad(zone * 6.0 - 183.0)
    lon, lat = _tm_inverse(x, y, lon0)
    return np.rad2deg(lon), np.rad2deg(lat)


def utm_zone_of(lon_deg: float) -> int:
    return int(np.floor((lon_deg + 180.0) / 6.0)) % 60 + 1


# ---------------------------------------------------------------------------
# CRS tags + batch transform (M2) + bbox→WGS84 (M8)
# ---------------------------------------------------------------------------


def _parse_crs(tag: str):
    t = tag.upper().replace(" ", "")
    if t in ("EPSG:4326", "WGS84"):
        return ("geographic",)
    if t == "EPSG:3395":
        return ("mercator",)
    if t.startswith("UTM:"):
        z = t[4:]
        south = z.endswith("S")
        return ("utm", int(z.rstrip("NS")), south)
    raise ValueError(f"unsupported CRS tag {tag!r} "
                     "(supported: EPSG:4326, EPSG:3395, UTM:<zone><N|S>)")


def transform(x, y, src: str, dst: str):
    """Project (x, y) arrays from ``src`` CRS to ``dst`` CRS (through
    geographic as the hub, like the reference's pyproj transformers)."""
    s = _parse_crs(src)
    d = _parse_crs(dst)
    if s == d:
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    if s[0] == "geographic":
        lon, lat = np.asarray(x, np.float64), np.asarray(y, np.float64)
    elif s[0] == "mercator":
        lon, lat = mercator_inverse(x, y)
    else:
        lon, lat = utm_inverse(x, y, s[1], s[2])
    if d[0] == "geographic":
        return lon, lat
    if d[0] == "mercator":
        return mercator_forward(lon, lat)
    return utm_forward(lon, lat, d[1], d[2])


def reproject_batch(batch, src: str, dst: str, x_col: str = "x",
                    y_col: str = "y"):
    """map_batches body: replace ``x``/``y`` with projected coords
    (M2, accessibility.py:40-50).  Zero-copy on all other columns."""
    import pyarrow as pa

    x = batch.column(x_col).to_numpy(zero_copy_only=False)
    y = batch.column(y_col).to_numpy(zero_copy_only=False)
    nx, ny = transform(x, y, src, dst)
    ix = batch.column_names.index(x_col)
    iy = batch.column_names.index(y_col)
    out = batch.set_column(ix, x_col, pa.array(nx))
    return out.set_column(iy, y_col, pa.array(ny))


def bbox_to_wgs84(x0: float, y0: float, x1: float, y1: float, src: str,
                  n_edge: int = 32):
    """Projected bbox → geographic (lon/lat) bbox (M8,
    availability.py:76-77).  Edges are densified before inverse
    projection so curvature of the projected graticule is bounded."""
    t = np.linspace(0.0, 1.0, n_edge)
    ex = np.concatenate([x0 + (x1 - x0) * t, np.full(n_edge, x1),
                         x1 + (x0 - x1) * t, np.full(n_edge, x0)])
    ey = np.concatenate([np.full(n_edge, y0), y0 + (y1 - y0) * t,
                         np.full(n_edge, y1), y1 + (y0 - y1) * t])
    lon, lat = transform(ex, ey, src, "EPSG:4326")
    return float(lon.min()), float(lat.min()), float(lon.max()), float(lat.max())
