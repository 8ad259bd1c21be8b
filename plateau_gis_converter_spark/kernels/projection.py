"""CRS projection kernels (vectorized NumPy) — the reference's
ProjectionTransform math (SURVEY §2.2 T1):

* ``geodetic_to_geocentric`` / ``geocentric_to_geodetic`` — ECEF, Vermeille
  2011 inverse (nusamai-projection/src/cartesian.rs:8-69; golden tests
  :164-243).
* ``ExtendedTransverseMercator`` — "exact" (Poder/Engsager) transverse
  Mercator, the public PROJ etmerc algorithm the reference also ports
  (nusamai-projection/src/etmerc.rs:1-3,37-213; coefficients :216-318;
  round-trip golden :373-402).
* ``JPR_ZONES`` — Japan Plane Rectangular CS I..XIX origins with k=0.9999 on
  GRS80 (nusamai-projection/src/jprect.rs:28,231-309).

Everything broadcasts over NumPy arrays so the Spark-side T1 operator is a
single Arrow-batched UDF over the vertex arrays.
"""

from __future__ import annotations

import numpy as np

ETMERC_ORDER = 6


class Ellipsoid:
    def __init__(self, a: float, inv_f: float):
        self.a = a
        self.inv_f = inv_f
        self.f = 1.0 / inv_f
        self.b = a * (1.0 - self.f)
        self.e_sq = self.f * (2.0 - self.f)


def wgs84() -> Ellipsoid:
    return Ellipsoid(6378137.0, 298.257223563)


def grs80() -> Ellipsoid:
    return Ellipsoid(6378137.0, 298.257222101)


# ---------------------------------------------------------------------------
# ECEF (cartesian.rs)
# ---------------------------------------------------------------------------

def geodetic_to_geocentric(ellips: Ellipsoid, lng, lat, height):
    lam = np.radians(np.asarray(lng, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    h = np.asarray(height, dtype=np.float64)
    if ellips.e_sq == 0.0:
        n = np.full_like(phi, ellips.a)
    else:
        n = ellips.a / np.sqrt(1.0 - ellips.e_sq * np.sin(phi) ** 2)
    x = (n + h) * np.cos(phi) * np.cos(lam)
    y = (n + h) * np.cos(phi) * np.sin(lam)
    z = (n * (1.0 - ellips.e_sq) + h) * np.sin(phi)
    return x, y, z


def geocentric_to_geodetic(ellips: Ellipsoid, x, y, z):
    """Vermeille (2011) analytic inverse (cartesian.rs:29-69)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    a = ellips.a
    e_sq = ellips.e_sq
    e_quad = e_sq * e_sq

    p = (x * x + y * y) / (a * a)
    q = (1.0 - e_sq) * z * z / (a * a)
    r = (p + q - e_quad) / 6.0
    evol = 8.0 * r ** 3 + e_quad * p * q

    with np.errstate(invalid="ignore", divide="ignore"):
        # outside evolute branch
        l_ = np.cbrt(np.sqrt(np.maximum(evol, 0.0)) + np.sqrt(e_quad * p * q))
        u_out = np.where(l_ != 0.0,
                         (3.0 * r * r) / (2.0 * l_ * l_)
                         + 0.5 * (l_ + np.where(l_ != 0.0, r / l_, 0.0)) ** 2,
                         0.0)
        # inside evolute branch
        t = 2.0 / 3.0 * np.arctan2(
            np.sqrt(e_quad * p * q),
            np.sqrt(np.maximum(-evol, 0.0)) + np.sqrt(np.maximum(-8.0 * r ** 3, 0.0)))
        u_in = -4.0 * r * np.sin(t) * np.cos(np.pi / 6.0 + t)
        u = np.where(evol > 0.0, u_out, u_in)

        v = np.sqrt(u * u + e_quad * q)
        w = e_sq * (u + v - q) / (2.0 * v)
        k = (u + v) / (np.sqrt(w * w + u + v) + w)
        d = k * np.sqrt(x * x + y * y) / (k + e_sq)
        dz = np.sqrt(d * d + z * z)
        h_main = (k + e_sq - 1.0) / k * dz
        phi_main = 2.0 * np.arctan2(z, d + dz)

        # singular disc branch (evol <= 0 and q == 0)
        h_disc = -a * np.sqrt((1.0 - e_sq) * (e_sq - p) / e_sq)
        phi_disc = 2.0 * np.arctan2(
            np.sqrt(np.maximum(e_quad - p, 0.0)),
            np.sqrt(np.maximum(e_sq * (e_sq - p), 0.0))
            + np.sqrt(np.maximum((1.0 - e_sq) * p, 0.0)))

    main = (evol > 0.0) | (q != 0.0)
    phi = np.where(main, phi_main, phi_disc)
    h = np.where(main, h_main, h_disc)
    lam = np.arctan2(y, x)
    return np.degrees(lam), np.degrees(phi), h


# ---------------------------------------------------------------------------
# Extended ("exact") Transverse Mercator — Poder/Engsager, PROJ etmerc
# ---------------------------------------------------------------------------

def _gatg(coeffs, b, cos_2b, sin_2b):
    h2 = np.zeros_like(np.asarray(b, dtype=np.float64))
    two_cos_2b = 2.0 * cos_2b
    h = np.full_like(h2, coeffs[-1])
    for v in coeffs[-2::-1]:
        h, h2 = -h2 + two_cos_2b * h + v, h
    return b + h * sin_2b


def _clens(coeffs, arg_r: float) -> float:
    cos_arg_r = np.cos(arg_r)
    r = 2.0 * cos_arg_r
    hr1 = 0.0
    hr = coeffs[-1]
    for v in coeffs[-2::-1]:
        hr, hr1 = -hr1 + r * hr + v, hr
    return np.sin(arg_r) * hr


def _clen_s(coeffs, sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i):
    r = 2.0 * cos_arg_r * cosh_arg_i
    i = -2.0 * sin_arg_r * sinh_arg_i
    hi1 = np.zeros_like(r)
    hr1 = np.zeros_like(r)
    hi = np.zeros_like(r)
    hr = np.full_like(r, coeffs[-1])
    for v in coeffs[-2::-1]:
        hr2, hi2 = hr1, hi1
        hr1, hi1 = hr, hi
        hr = -hr2 + r * hr1 - i * hi1 + v
        hi = -hi2 + i * hr1 + r * hi1
    rr = sin_arg_r * cosh_arg_i
    ii = cos_arg_r * sinh_arg_i
    return rr * hr - ii * hi, rr * hi + ii * hr


class ExtendedTransverseMercator:
    """etmerc.rs:37-213 with identical Poder/Engsager coefficient series."""

    DOMAIN = 2.623395162778  # 150 degrees

    def __init__(self, lng0: float, lat0: float, k: float, ellips: Ellipsoid):
        self.lam0 = np.radians(lng0)
        self.a = ellips.a
        n = ellips.f / (2.0 - ellips.f)
        cgb = np.zeros(ETMERC_ORDER)
        cbg = np.zeros(ETMERC_ORDER)
        utg = np.zeros(ETMERC_ORDER)
        gtu = np.zeros(ETMERC_ORDER)

        np_ = n
        cgb[0] = n * (2. + n * (-2. / 3. + n * (-2. + n * (116. / 45. + n * (
            26. / 45. + n * (-2854. / 675.))))))
        cbg[0] = n * (-2. + n * (2. / 3. + n * (4. / 3. + n * (-82. / 45. + n * (
            32. / 45. + n * (4642. / 4725.))))))
        np_ *= n
        cgb[1] = np_ * (7. / 3. + n * (-8. / 5. + n * (-227. / 45. + n * (
            2704. / 315. + n * (2323. / 945.)))))
        cbg[1] = np_ * (5. / 3. + n * (-16. / 15. + n * (-13. / 9. + n * (
            904. / 315. + n * (-1522. / 945.)))))
        np_ *= n
        cgb[2] = np_ * (56. / 15. + n * (-136. / 35. + n * (-1262. / 105. + n * (
            73814. / 2835.))))
        cbg[2] = np_ * (-26. / 15. + n * (34. / 21. + n * (8. / 5. + n * (
            -12686. / 2835.))))
        np_ *= n
        cgb[3] = np_ * (4279. / 630. + n * (-332. / 35. + n * (-399572. / 14175.)))
        cbg[3] = np_ * (1237. / 630. + n * (-12. / 5. + n * (-24832. / 14175.)))
        np_ *= n
        cgb[4] = np_ * (4174. / 315. + n * (-144838. / 6237.))
        cbg[4] = np_ * (-734. / 315. + n * (109598. / 31185.))
        np_ *= n
        cgb[5] = np_ * (601676. / 22275.)
        cbg[5] = np_ * (444337. / 155925.)

        np2 = n * n
        self.q_n = k / (1. + n) * (1. + np2 * (1. / 4. + np2 * (
            1. / 64. + np2 / 256.)))

        utg[0] = n * (-0.5 + n * (2. / 3. + n * (-37. / 96. + n * (
            1. / 360. + n * (81. / 512. + n * (-96199. / 604800.))))))
        gtu[0] = n * (0.5 + n * (-2. / 3. + n * (5. / 16. + n * (
            41. / 180. + n * (-127. / 288. + n * (7891. / 37800.))))))
        utg[1] = np2 * (-1. / 48. + n * (-1. / 15. + n * (437. / 1440. + n * (
            -46. / 105. + n * (1118711. / 3870720.)))))
        gtu[1] = np2 * (13. / 48. + n * (-3. / 5. + n * (557. / 1440. + n * (
            281. / 630. + n * (-1983433. / 1935360.)))))
        np3 = np2 * n
        utg[2] = np3 * (-17. / 480. + n * (37. / 840. + n * (209. / 4480. + n * (
            -5569. / 90720.))))
        gtu[2] = np3 * (61. / 240. + n * (-103. / 140. + n * (15061. / 26880. + n * (
            167603. / 181440.))))
        np4 = np3 * n
        utg[3] = np4 * (-4397. / 161280. + n * (11. / 504. + n * (830251. / 7257600.)))
        gtu[3] = np4 * (49561. / 161280. + n * (-179. / 168. + n * (6601661. / 7257600.)))
        np5 = np4 * n
        utg[4] = np5 * (-4583. / 161280. + n * (108847. / 3991680.))
        gtu[4] = np5 * (34729. / 80640. + n * (-3418889. / 1995840.))
        np6 = np5 * n
        utg[5] = np6 * (-20648693. / 638668800.)
        gtu[5] = np6 * (212378941. / 319334400.)

        self.cgb, self.cbg, self.utg, self.gtu = cgb, cbg, utg, gtu

        phi0 = np.radians(lat0)
        zz = _gatg(cbg, phi0, np.cos(2. * phi0), np.sin(2. * phi0))
        self.z_b = -self.q_n * (zz + _clens(gtu, 2. * zz))

    def forward(self, lng, lat, z=0.0):
        """degrees -> projected meters (etmerc.rs:66-146)."""
        lam = np.radians(np.asarray(lng, dtype=np.float64)) - self.lam0
        phi = np.radians(np.asarray(lat, dtype=np.float64))

        cn = _gatg(self.cbg, phi, np.cos(2. * phi), np.sin(2. * phi))
        sin_cn, cos_cn = np.sin(cn), np.cos(cn)
        sin_ce, cos_ce = np.sin(lam), np.cos(lam)
        cos_cn_cos_ce = cos_cn * cos_ce
        cn = np.arctan2(sin_cn, cos_cn_cos_ce)
        inv_denom = 1.0 / np.hypot(sin_cn, cos_cn_cos_ce)
        tan_ce = sin_ce * cos_cn * inv_denom
        ce = np.arcsinh(tan_ce)
        two_inv = 2.0 * inv_denom
        two_inv_sq = two_inv * inv_denom
        tmp_r = cos_cn_cos_ce * two_inv_sq
        sin_arg_r = sin_cn * tmp_r
        cos_arg_r = cos_cn_cos_ce * tmp_r - 1.0
        sinh_arg_i = tan_ce * two_inv
        cosh_arg_i = two_inv_sq - 1.0
        dcn, dce = _clen_s(self.gtu, sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i)
        cn = cn + dcn
        ce = ce + dce
        if np.any(np.abs(ce) > self.DOMAIN):
            raise ValueError("outside projection domain")
        y = self.q_n * cn + self.z_b
        x = self.q_n * ce
        return x * self.a, y * self.a, np.asarray(z, dtype=np.float64)

    def inverse(self, x, y, z=0.0):
        """projected meters -> degrees (etmerc.rs:148-213)."""
        x = np.asarray(x, dtype=np.float64) / self.a
        y = np.asarray(y, dtype=np.float64) / self.a
        cn = (y - self.z_b) / self.q_n
        ce = x / self.q_n
        if np.any(np.abs(ce) > self.DOMAIN):
            raise ValueError("outside projection domain")
        sin_arg_r = np.sin(2. * cn)
        cos_arg_r = np.cos(2. * cn)
        exp_2_ce = np.exp(2. * ce)
        half_inv = 0.5 / exp_2_ce
        sinh_arg_i = 0.5 * exp_2_ce - half_inv
        cosh_arg_i = 0.5 * exp_2_ce + half_inv
        dcn, dce = _clen_s(self.utg, sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i)
        cn = cn + dcn
        ce = ce + dce
        sin_cn, cos_cn = np.sin(cn), np.cos(cn)
        sinhce = np.sinh(ce)
        ce = np.arctan2(sinhce, cos_cn)
        modulus_ce = np.hypot(sinhce, cos_cn)
        cn = np.arctan2(sin_cn, modulus_ce)
        tmp = 2. * modulus_ce / (sinhce * sinhce + 1.)
        sin_2_cn = sin_cn * tmp
        cos_2_cn = tmp * modulus_ce - 1.
        phi = _gatg(self.cgb, cn, cos_2_cn, sin_2_cn)
        lam = ce
        return (np.degrees(lam + self.lam0), np.degrees(phi),
                np.asarray(z, dtype=np.float64))


JPR_K = 0.9999
# Japan Plane Rectangular zone origins (jprect.rs:231-309)
JPR_ZONES = {
    1: (129.5, 33.0), 2: (131.0, 33.0), 3: (132.16666666666667, 36.0),
    4: (133.5, 33.0), 5: (134.33333333333333, 36.0), 6: (136.0, 36.0),
    7: (137.16666666666667, 36.0), 8: (138.5, 36.0),
    9: (139.83333333333333, 36.0), 10: (140.83333333333333, 40.0),
    11: (140.25, 44.0), 12: (142.25, 44.0), 13: (144.25, 44.0),
    14: (142.0, 26.0), 15: (127.5, 26.0), 16: (124.0, 26.0),
    17: (131.0, 26.0), 18: (136.0, 20.0), 19: (154.0, 26.0),
}


def jpr_zone_projection(zone_no: int) -> ExtendedTransverseMercator:
    lng0, lat0 = JPR_ZONES[zone_no]
    return ExtendedTransverseMercator(lng0, lat0, JPR_K, grs80())
