"""Hyperbolic solver validation: geometry sweeps, timing-error sweeps.

Reproduces the reference's offline validation harness
(`tests/test_tdoa_validation.py`): known emitter → geometric delays (+
injected timing error) → recovered position, across geometries. Their
BFGS-based results were 284.8 m at 1 µs error and 11.9 km at 100 µs
(`Documents/TDOA_README.md:55-58`); the LM solver must do at least as well.
"""

import numpy as np
import jax.numpy as jnp
import scipy.optimize

from radio_mapper_tpu import geo, sim, solver
from radio_mapper_tpu.constants import SPEED_OF_LIGHT_M_S
from radio_mapper_tpu.ops.gcc_phat import pair_indices


def _scenario_dd(scen: sim.Scenario, timing_error_s=0.0, seed=0):
    """Geometric distance differences for all pairs, with injected noise."""
    rng = np.random.default_rng(seed)
    anchors = scen.buoy_enu()
    emitter = scen.emitter_enu(scen.emitters[0])
    dists = np.linalg.norm(anchors - emitter, axis=1)
    delays = dists / SPEED_OF_LIGHT_M_S
    delays = delays + rng.normal(scale=timing_error_s, size=delays.shape)
    i_idx, j_idx = pair_indices(len(anchors))
    dd = (delays[i_idx] - delays[j_idx]) * SPEED_OF_LIGHT_M_S
    return anchors, emitter, i_idx, j_idx, dd


def _solve_error_m(scen, timing_error_s=0.0, seed=0, multistart=False):
    anchors, emitter, i_idx, j_idx, dd = _scenario_dd(scen, timing_error_s, seed)
    fn = solver.solve_tdoa_multistart if multistart else solver.solve_tdoa
    res = fn(
        jnp.asarray(anchors, jnp.float32),
        jnp.asarray(i_idx),
        jnp.asarray(j_idx),
        jnp.asarray(dd, jnp.float32),
    )
    est = np.asarray(res.position_enu)
    return float(np.linalg.norm(est[:2] - emitter[:2])), res


def test_perfect_timing_recovers_position():
    scen = sim.default_scenario()
    err, res = _solve_error_m(scen)
    assert err < 5.0, err
    assert bool(np.asarray(res.converged))


def test_1us_timing_error_beats_reference():
    # Reference managed 284.8 m at 1 µs (`Documents/TDOA_README.md:55-57`).
    errs = [
        _solve_error_m(sim.default_scenario(), timing_error_s=1e-6, seed=s)[0]
        for s in range(8)
    ]
    assert float(np.median(errs)) < 284.8, errs


def test_100us_timing_error_degrades_gracefully():
    err, _ = _solve_error_m(sim.default_scenario(), timing_error_s=100e-6, seed=1)
    # Reference saw 11,947 m; we only demand bounded output (no divergence).
    assert np.isfinite(err) and err < 150_000


def test_triangle_geometry():
    buoys = (
        ("b1", 35.5513, -97.5322, 0.0),
        ("b2", 35.3842, -97.4322, 0.0),
        ("b3", 35.3842, -97.6322, 0.0),
    )
    scen = sim.default_scenario(buoys=buoys, emitter_lat=35.44, emitter_lng=-97.53)
    err, _ = _solve_error_m(scen)
    # Reference's 3-buoy triangle figure is 210.7 m with timing noise;
    # with exact delays the solver should nail it.
    assert err < 10.0, err


def test_linear_geometry_does_not_explode():
    # Near-collinear arrays are the reference solver's divergence case.
    buoys = (
        ("b1", 35.40, -97.70, 0.0),
        ("b2", 35.40, -97.55, 0.0),
        ("b3", 35.40, -97.40, 0.0),
    )
    scen = sim.default_scenario(buoys=buoys, emitter_lat=35.43, emitter_lng=-97.50)
    err, res = _solve_error_m(scen, multistart=True)
    assert np.all(np.isfinite(np.asarray(res.position_enu)))
    # Cross-range is weakly observable but along-range should be decent.
    assert err < 5_000


def test_linear_geometry_ellipse_reports_cross_track_ambiguity():
    """A collinear E-W array must confess its weak north-south axis.

    The reference's residual-RMS "accuracy" (`tdoa_processor.py:299`) looks
    small here because an all-pairs dd set from 3 receivers fits exactly;
    the CRLB ellipse must instead report a strongly anisotropic ellipse
    whose major axis points cross-track (≈ North for an E-W array).
    """
    buoys = (
        ("b1", 35.40, -97.70, 0.0),
        ("b2", 35.40, -97.55, 0.0),
        ("b3", 35.40, -97.40, 0.0),
    )
    scen = sim.default_scenario(buoys=buoys, emitter_lat=35.43, emitter_lng=-97.50)
    anchors, emitter, i_idx, j_idx, dd = _scenario_dd(scen, timing_error_s=1e-6, seed=0)
    sigma = SPEED_OF_LIGHT_M_S * 1e-6  # known 1σ per-receiver noise, meters
    res = solver.solve_tdoa_multistart(
        jnp.asarray(anchors, jnp.float32),
        jnp.asarray(i_idx),
        jnp.asarray(j_idx),
        jnp.asarray(dd, jnp.float32),
        sigma_m=jnp.float32(sigma),
    )
    major = float(np.asarray(res.ellipse_major_m))
    minor = float(np.asarray(res.ellipse_minor_m))
    bearing = float(np.asarray(res.ellipse_orientation_deg))
    rms = float(np.asarray(res.residual_rms_m))
    assert rms < 10.0, rms  # the deceptive part: near-perfect residual fit
    assert major / max(minor, 1e-6) > 3.0, (major, minor)
    assert major > 500.0, major  # the honest multi-hundred-meter ambiguity
    # major axis ≈ cross-track (North); bearing folds to [0, 180)
    assert min(bearing, 180.0 - bearing) < 25.0, bearing


def test_ellipse_monte_carlo_coverage():
    """1σ CRLB ellipse calibration against Monte-Carlo scatter — PINNED.

    Per-receiver timing noise, known σ: the fraction of trials inside the
    68% confidence ellipse (Mahalanobis² ≤ 2.279 for 2-D) must be 0.68
    within ±2% (VERDICT r3 item 6). Diagnosis of the r3 "65% vs 68%"
    finding: it was Monte-Carlo sampling noise — at the old N=200 the
    coverage SE is 3.3%, so 65% sat within 1σ of nominal; at N=4000
    (SE 0.74%) the measured coverage is 68.8%, i.e. the receiver-model
    GLS sandwich is calibrated, with no linearization or σ-estimation
    bias at this noise level (bias_m ≈ 3 m ≪ 213 m scatter).
    """
    scen = sim.default_scenario()
    anchors = scen.buoy_enu()
    emitter = scen.emitter_enu(scen.emitters[0])
    i_idx, j_idx = pair_indices(len(anchors))
    n_trials, sigma_t = 4000, 1e-6
    rng = np.random.default_rng(0)
    dists = np.linalg.norm(anchors - emitter, axis=1)
    delays = dists / SPEED_OF_LIGHT_M_S
    noisy = delays[None, :] + rng.normal(
        scale=sigma_t, size=(n_trials, len(anchors))
    )
    dds = (noisy[:, i_idx] - noisy[:, j_idx]) * SPEED_OF_LIGHT_M_S
    res = solver.solve_tdoa(
        jnp.asarray(anchors, jnp.float32),
        jnp.asarray(i_idx),
        jnp.asarray(j_idx),
        jnp.asarray(dds, jnp.float32),
        sigma_m=jnp.float32(SPEED_OF_LIGHT_M_S * sigma_t),
    )
    est = np.asarray(res.position_enu)[:, :2]
    err = est - emitter[:2]
    cov = np.asarray(res.cov_enu)[:, :2, :2].astype(np.float64)
    d2 = np.einsum("ni,nij,nj->n", err, np.linalg.inv(cov), err)
    coverage = float(np.mean(d2 <= 2.279))
    assert 0.66 <= coverage <= 0.70, coverage
    # predicted axis matches the empirical scatter scale
    pred = float(np.median(np.asarray(res.ellipse_major_m)))
    scatter = float(err.std(axis=0).max())
    assert 0.9 < pred / scatter < 1.1, (pred, scatter)


def test_ellipse_residual_sigma_estimate_right_order():
    """Without a known σ, the receiver-model residual estimate lands within
    a factor ~3 of the true scatter (χ²-few-dof spread is expected)."""
    scen = sim.default_scenario()
    anchors = scen.buoy_enu()
    emitter = scen.emitter_enu(scen.emitters[0])
    i_idx, j_idx = pair_indices(len(anchors))
    dds = np.stack(
        [_scenario_dd(scen, timing_error_s=1e-6, seed=s)[4] for s in range(100)]
    )
    res = solver.solve_tdoa(
        jnp.asarray(anchors, jnp.float32),
        jnp.asarray(i_idx),
        jnp.asarray(j_idx),
        jnp.asarray(dds, jnp.float32),
    )
    est = np.asarray(res.position_enu)[:, :2]
    scatter = float((est - emitter[:2]).std(axis=0).max())
    pred = float(np.median(np.asarray(res.ellipse_major_m)))
    assert scatter / 3.0 < pred < scatter * 3.0, (pred, scatter)


def test_error_ellipse_from_cov_closed_form():
    # isotropic → equal axes; pure-East elongation → bearing 90°
    iso = jnp.asarray(np.diag([4.0, 4.0, 0.0]), jnp.float32)
    a, b, _ = solver.error_ellipse_from_cov(iso)
    assert abs(float(a) - 2.0) < 1e-5 and abs(float(b) - 2.0) < 1e-5
    east = jnp.asarray(np.diag([9.0, 1.0, 0.0]), jnp.float32)
    a, b, brg = solver.error_ellipse_from_cov(east)
    assert abs(float(a) - 3.0) < 1e-5 and abs(float(b) - 1.0) < 1e-5
    assert abs(float(brg) - 90.0) < 1e-3
    north = jnp.asarray(np.diag([1.0, 9.0, 0.0]), jnp.float32)
    a, b, brg = solver.error_ellipse_from_cov(north)
    assert abs(float(a) - 3.0) < 1e-5
    assert min(float(brg), 180.0 - float(brg)) < 1e-3


def test_emitter_outside_hull_with_multistart():
    # ~40 km outside the array: GDOP amplifies fp32 rounding into tens of
    # meters even with exact delays. The point of this test is that
    # multi-start avoids the local-minimum failure (kilometers off / NaN).
    scen = sim.default_scenario(emitter_lat=35.75, emitter_lng=-97.20)
    err, _ = _solve_error_m(scen, multistart=True)
    assert err < 300.0, err


def test_batched_solve_over_groups():
    """One jitted call solves many frequency groups at once."""
    scens = [
        sim.default_scenario(emitter_lat=35.42 + 0.02 * k, emitter_lng=-97.55 + 0.015 * k)
        for k in range(5)
    ]
    anchors = np.stack([s.buoy_enu() for s in scens])  # identical, but batched
    i_idx, j_idx = pair_indices(4)
    dds, emitters = [], []
    for s in scens:
        _, emitter, _, _, dd = _scenario_dd(s)
        dds.append(dd)
        emitters.append(emitter)
    res = solver.solve_tdoa(
        jnp.asarray(anchors, jnp.float32),
        jnp.asarray(i_idx),
        jnp.asarray(j_idx),
        jnp.asarray(np.stack(dds), jnp.float32),
    )
    assert res.position_enu.shape == (5, 3)
    est = np.asarray(res.position_enu)[:, :2]
    want = np.stack(emitters)[:, :2]
    assert np.all(np.linalg.norm(est - want, axis=1) < 10.0)


def test_weights_suppress_bad_measurement():
    scen = sim.default_scenario()
    anchors, emitter, i_idx, j_idx, dd = _scenario_dd(scen)
    dd_bad = dd.copy()
    dd_bad[0] += 30_000.0  # corrupt one pair by 30 km
    w = np.ones_like(dd)
    w[0] = 0.0
    res = solver.solve_tdoa(
        jnp.asarray(anchors, jnp.float32),
        jnp.asarray(i_idx),
        jnp.asarray(j_idx),
        jnp.asarray(dd_bad, jnp.float32),
        jnp.asarray(w, jnp.float32),
    )
    est = np.asarray(res.position_enu)
    assert np.linalg.norm(est[:2] - emitter[:2]) < 10.0
    assert int(np.asarray(res.num_measurements)) == len(dd) - 1


def test_agrees_with_scipy_least_squares():
    scen = sim.default_scenario(emitter_lat=35.50, emitter_lng=-97.45)
    anchors, emitter, i_idx, j_idx, dd = _scenario_dd(scen, timing_error_s=0.5e-6, seed=3)

    def resid(p):
        d = np.linalg.norm(anchors[:, :2] - p, axis=1)
        return d[i_idx] - d[j_idx] - dd

    ref = scipy.optimize.least_squares(resid, anchors[:, :2].mean(0), method="lm")
    res = solver.solve_tdoa(
        jnp.asarray(anchors, jnp.float32),
        jnp.asarray(i_idx),
        jnp.asarray(j_idx),
        jnp.asarray(dd, jnp.float32),
    )
    est = np.asarray(res.position_enu)[:2]
    assert np.linalg.norm(est - ref.x) < 2.0, (est, ref.x)


def test_full_waveform_pipeline_to_position():
    """End-to-end: synthesized IQ → GCC-PHAT lags → solver → lat/lng fix."""
    from radio_mapper_tpu.ops import gcc_phat as gp

    scen = sim.default_scenario(signal="noise", bandwidth_hz=150e3, snr_db=25.0, seed=8)
    cap = sim.synthesize(scen)
    peaks = gp.gcc_phat_all_pairs(
        jnp.asarray(cap.iq, jnp.complex64),
        sample_rate_hz=scen.sample_rate_hz,
        max_lag=600,
    )
    i_idx, j_idx = gp.pair_indices(len(scen.buoys))
    dd = np.asarray(peaks.tau_s, np.float64) * SPEED_OF_LIGHT_M_S
    res = solver.solve_tdoa(
        jnp.asarray(cap.buoy_enu, jnp.float32),
        jnp.asarray(i_idx),
        jnp.asarray(j_idx),
        jnp.asarray(dd, jnp.float32),
    )
    est_enu = np.asarray(res.position_enu)
    err = np.linalg.norm(est_enu[:2] - cap.emitter_enu[0][:2])
    # Sub-sample lag accuracy at 2.048 MS/s ⇒ ~15 m per 0.1 sample; the
    # 4-buoy fix should land well inside the reference's 86.1 m best case.
    assert err < 50.0, err
    lat, lng, _ = geo.enu_to_lat_lng(jnp.asarray(est_enu), *scen.ref_origin)
    assert abs(float(lat) - scen.emitters[0].lat) < 0.001
    assert abs(float(lng) - scen.emitters[0].lng) < 0.001


def test_pair_noise_model_covariance():
    """noise_model="pair" uses the classic σ²(JᵀWJ)⁻¹; with truly
    independent per-pair noise and known σ its coverage is ≈ nominal."""
    scen = sim.default_scenario()
    anchors = scen.buoy_enu()
    emitter = scen.emitter_enu(scen.emitters[0])
    i_idx, j_idx = pair_indices(len(anchors))
    rng = np.random.default_rng(0)
    d = np.linalg.norm(anchors - emitter, axis=1)
    dd_true = d[i_idx] - d[j_idx]
    sigma = 150.0  # meters, independent per PAIR (not per receiver)
    n_trials = 200
    dds = dd_true[None] + rng.normal(scale=sigma, size=(n_trials, len(i_idx)))
    res = solver.solve_tdoa(
        jnp.asarray(anchors, jnp.float32),
        jnp.asarray(i_idx),
        jnp.asarray(j_idx),
        jnp.asarray(dds, jnp.float32),
        noise_model="pair",
        sigma_m=jnp.float32(sigma),
    )
    est = np.asarray(res.position_enu)[:, :2]
    err = est - emitter[:2]
    cov = np.asarray(res.cov_enu)[:, :2, :2].astype(np.float64)
    d2 = np.einsum("ni,nij,nj->n", err, np.linalg.inv(cov), err)
    coverage = float(np.mean(d2 <= 2.279))
    assert 0.5 <= coverage <= 0.85, coverage


def test_3d_solve_covariance_finite_and_vertical_weak():
    """solve_2d=False exercises the full 3×3 inverse (_inv3): coplanar
    receivers make altitude nearly unobservable, so the Up variance must
    dwarf the horizontal ones while staying finite (det floor)."""
    scen = sim.default_scenario()
    anchors, emitter, i_idx, j_idx, dd = _scenario_dd(scen, timing_error_s=1e-6, seed=2)
    res = solver.solve_tdoa(
        jnp.asarray(anchors, jnp.float32),
        jnp.asarray(i_idx),
        jnp.asarray(j_idx),
        jnp.asarray(dd, jnp.float32),
        solve_2d=False,
        sigma_m=jnp.float32(SPEED_OF_LIGHT_M_S * 1e-6),
    )
    cov = np.asarray(res.cov_enu, np.float64)
    assert np.all(np.isfinite(cov))
    up_var = cov[2, 2]
    horiz_var = max(cov[0, 0], cov[1, 1])
    assert up_var > 10.0 * horiz_var, (up_var, horiz_var)
    # the horizontal ellipse stays sensible
    assert 10.0 < float(np.asarray(res.ellipse_major_m)) < 1e7


def test_multistart_accepts_all_covariance_kwargs_combined():
    """Multi-start + 3-D + pair noise model + known sigma + floor in one
    call: the kwargs must compose (the floor dominates the smaller sigma)."""
    scen = sim.default_scenario()
    anchors = scen.buoy_enu()
    emitter = scen.emitter_enu(scen.emitters[0])
    i_idx, j_idx = pair_indices(len(anchors))
    d = np.linalg.norm(anchors - emitter, axis=1)
    dd = (d[i_idx] - d[j_idx]).astype(np.float32)
    lo = solver.solve_tdoa_multistart(
        jnp.asarray(anchors, jnp.float32), jnp.asarray(i_idx), jnp.asarray(j_idx),
        jnp.asarray(dd), num_starts=3, solve_2d=False,
        noise_model="pair", sigma_m=jnp.float32(50.0),
    )
    hi = solver.solve_tdoa_multistart(
        jnp.asarray(anchors, jnp.float32), jnp.asarray(i_idx), jnp.asarray(j_idx),
        jnp.asarray(dd), num_starts=3, solve_2d=False,
        noise_model="pair", sigma_m=jnp.float32(50.0),
        sigma_floor_m=jnp.float32(100.0),
    )
    err = float(np.linalg.norm(np.asarray(hi.position_enu)[:2] - emitter[:2]))
    assert err < 50.0
    # floor (100) doubles sigma vs the bare sigma_m=50 run -> 2x the axes
    ratio = float(hi.ellipse_major_m) / float(lo.ellipse_major_m)
    assert abs(ratio - 2.0) < 0.05, ratio
