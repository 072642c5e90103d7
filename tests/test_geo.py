import numpy as np
import jax.numpy as jnp

from radio_mapper_tpu import geo


OKC = (35.5513, -97.5322, 365.8)


def test_sphere_roundtrip():
    x, y, z = geo.lat_lng_to_ecef_sphere(*OKC)
    lat, lng, alt = geo.ecef_to_lat_lng_sphere(x, y, z)
    np.testing.assert_allclose([float(lat), float(lng)], OKC[:2], atol=1e-4)
    assert abs(float(alt) - OKC[2]) < 1.0


def test_sphere_matches_reference_formula():
    # Independent check of the reference math (`tdoa_processor.py:77-93`).
    lat, lng, alt = OKC
    import math

    r = 6378137.0 + alt
    want = (
        r * math.cos(math.radians(lat)) * math.cos(math.radians(lng)),
        r * math.cos(math.radians(lat)) * math.sin(math.radians(lng)),
        r * math.sin(math.radians(lat)),
    )
    got = geo.lat_lng_to_ecef_sphere(lat, lng, alt)
    np.testing.assert_allclose([float(g) for g in got], want, rtol=1e-6)


def test_wgs84_roundtrip():
    x, y, z = geo.lat_lng_to_ecef_wgs84(*OKC)
    lat, lng, alt = geo.ecef_to_lat_lng_wgs84(x, y, z)
    np.testing.assert_allclose([float(lat), float(lng)], OKC[:2], atol=1e-5)
    assert abs(float(alt) - OKC[2]) < 5.0  # fp32 quantization of large ECEF


def test_bearing_distance_known_values():
    # OKC -> Tulsa: roughly 159 km, bearing roughly NE (~57 deg).
    b, d = geo.bearing_distance(35.4676, -97.5164, 36.1540, -95.9928)
    assert 150_000 < float(d) < 170_000
    assert 55 < float(b) < 70


def test_enu_roundtrip_and_scale():
    ref = OKC
    # Point ~11 km east: 0.1 deg longitude at this latitude.
    lat, lng = OKC[0], OKC[1] + 0.1
    enu = geo.lat_lng_to_enu(lat, lng, 0.0, *ref)
    e, n, u = [float(v) for v in np.asarray(enu)]
    assert 8_500 < e < 9_500  # cos(35.55°)*111.3 km/deg*0.1 ≈ 9.06 km
    assert abs(n) < 200
    back = geo.enu_to_lat_lng(enu, *ref)
    np.testing.assert_allclose([float(back[0]), float(back[1])], [lat, lng], atol=1e-4)


def test_enu_jax_matches_numpy_golden():
    ref = OKC
    lat, lng, alt = 35.4, -97.6, 100.0
    got = np.asarray(geo.lat_lng_to_enu(lat, lng, alt, *ref))
    want = geo.lat_lng_to_enu_np(lat, lng, alt, *ref)
    # fp32 ECEF is quantized at ~0.5 m near the Earth radius; the ENU
    # difference of two such values carries a couple meters of noise. Hosts
    # compute anchor ENU in float64 (sim/runtime paths); the jax version is
    # for traced code where meters-level init error is irrelevant.
    np.testing.assert_allclose(got, want, atol=3.0)


def test_batched_enu():
    lats = jnp.asarray([35.4, 35.5, 35.6])
    lngs = jnp.asarray([-97.6, -97.5, -97.4])
    alts = jnp.zeros(3)
    enu = geo.lat_lng_to_enu(lats, lngs, alts, OKC[0], OKC[1], 0.0)
    assert enu.shape == (3, 3)
