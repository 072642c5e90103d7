"""Pair-parallel (EP) sharding: psum-reduced LM solve + EP GCC step.

VERDICT r1 item 4: shard the P = B(B−1)/2 pair axis over a mesh
dimension, all_gather the B per-receiver spectra, psum the per-pair
normal-equation contributions into one solve. Proven here on the
8-device virtual CPU mesh: pair-sharded numerics equal the local solve,
and a 64-buoy / 2016-pair configuration runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from radio_mapper_tpu import geo, sim, solver
from radio_mapper_tpu.ops import gcc_phat as gcc_ops
from radio_mapper_tpu.parallel.pair_ep import PairEPConfig, build_pair_ep_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("pair",))


def _synthetic_case(num_buoys=8, seed=0):
    """Random geometry + exact dd from a known emitter, mild weight spread."""
    rng = np.random.default_rng(seed)
    anchors = rng.normal(scale=8_000.0, size=(num_buoys, 3)).astype(np.float32)
    anchors[:, 2] = 0.0
    emitter = np.array([1500.0, -2200.0, 0.0], np.float32)
    i_idx, j_idx = gcc_ops.pair_indices(num_buoys)
    d = np.linalg.norm(anchors - emitter, axis=1)
    dd = (d[i_idx] - d[j_idx]).astype(np.float32)
    dd += rng.normal(scale=5.0, size=dd.shape).astype(np.float32)  # 5 m noise
    w = rng.uniform(0.2, 1.0, size=dd.shape).astype(np.float32)
    return anchors, i_idx, j_idx, dd, w, emitter


def test_pair_sharded_solve_equals_local():
    """solve_tdoa(axis_name=...) over sharded pairs == the local solve."""
    anchors, i_idx, j_idx, dd, w, emitter = _synthetic_case(num_buoys=17)  # P=136=8·17
    local = solver.solve_tdoa(anchors, i_idx, j_idx, dd, w, iterations=30)

    mesh = _mesh()

    def ep(anc, pi, pj, dd_l, w_l):
        return solver.solve_tdoa(
            anc, pi, pj, dd_l, w_l, iterations=30, axis_name="pair"
        ).position_enu

    sharded = jax.jit(
        jax.shard_map(
            ep,
            mesh=mesh,
            in_specs=(P(), P("pair"), P("pair"), P("pair"), P("pair")),
            out_specs=P(),
            check_vma=False,  # psum makes outputs replicated; checker can't see through jit
        )
    )(anchors, jnp.asarray(i_idx), jnp.asarray(j_idx), dd, w)

    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(local.position_enu), atol=0.5
    )
    assert np.linalg.norm(np.asarray(sharded)[:2] - emitter[:2]) < 50.0


def test_pair_sharded_solve_handles_masked_shards():
    """A shard whose local pairs are ALL weight-0 must not poison the fix
    (the global-emptiness psum check)."""
    anchors, i_idx, j_idx, dd, w, emitter = _synthetic_case(num_buoys=9, seed=3)
    w_masked = w.copy()
    # Zero the pairs that land on shards 0 and 1 (P=36 → 2 shards of 4... 36/8
    # isn't integral; pad to 40 like the step does — here just zero a stripe).
    w_masked[:8] = 0.0
    local = solver.solve_tdoa(anchors, i_idx, j_idx, dd, w_masked, iterations=30)

    mesh = _mesh()
    # pad P 36 → 40 so it shards evenly over 8
    pad = 4
    pi = np.concatenate([i_idx, np.zeros(pad, np.int32)])
    pj = np.concatenate([j_idx, np.ones(pad, np.int32)])
    ddp = np.concatenate([dd, np.zeros(pad, np.float32)])
    wp = np.concatenate([w_masked, np.zeros(pad, np.float32)])

    def ep(anc, pi_l, pj_l, dd_l, w_l):
        return solver.solve_tdoa(
            anc, pi_l, pj_l, dd_l, w_l, iterations=30, axis_name="pair"
        ).position_enu

    sharded = jax.jit(
        jax.shard_map(
            ep,
            mesh=mesh,
            in_specs=(P(), P("pair"), P("pair"), P("pair"), P("pair")),
            out_specs=P(),
            check_vma=False,  # psum makes outputs replicated; checker can't see through jit
        )
    )(anchors, jnp.asarray(pi), jnp.asarray(pj), ddp, wp)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(local.position_enu), atol=0.5
    )


def test_pair_ep_step_recovers_emitter():
    """Full EP step (sharded FFT → all_gather → pair slice → psum solve)
    localizes a synthetic wideband emitter."""
    mesh = _mesh()
    scen = sim.default_scenario(
        block_len=4096, snr_db=25.0, seed=11, bandwidth_hz=500e3,
        buoys=[
            (f"b{k}", 35.40 + 0.05 * (k % 4), -97.60 + 0.06 * (k // 4), 0.0)
            for k in range(8)
        ],
    )
    cap = sim.synthesize(scen)
    cfg = PairEPConfig(
        num_buoys=8, block_len=4096, sample_rate_hz=scen.sample_rate_hz,
        max_lag=256,
    )
    step, shardings, (pi, pj) = build_pair_ep_step(mesh, cfg)
    re = jax.device_put(cap.iq.real.astype(np.float32), shardings[0])
    im = jax.device_put(cap.iq.imag.astype(np.float32), shardings[1])
    anchors = jax.device_put(cap.buoy_enu.astype(np.float32), shardings[2])
    out = step(re, im, anchors)
    err = np.linalg.norm(np.asarray(out.fix_enu)[:2] - cap.emitter_enu[0][:2])
    assert err < 100.0, f"EP fix error {err:.1f} m"
    # Pair lags match the local all-pairs op.
    local = gcc_ops.gcc_phat_all_pairs(
        jnp.asarray(cap.iq, jnp.complex64),
        sample_rate_hz=scen.sample_rate_hz, max_lag=256,
    )
    got = np.asarray(out.lags)[: len(pi)]
    np.testing.assert_allclose(got, np.asarray(local.lag_samples), atol=0.05)


def test_pair_ep_64_buoys_2016_pairs():
    """The scale target: 64 receivers → 2016 pairs sharded 252/device
    compiles and runs (the local op would materialize all 2016 pair
    spectra per device)."""
    mesh = _mesh()
    rng = np.random.default_rng(0)
    b, n = 64, 2048
    cfg = PairEPConfig(
        num_buoys=b, block_len=n, sample_rate_hz=2_048_000.0, max_lag=128,
        solver_iterations=10,
    )
    step, shardings, (pi, pj) = build_pair_ep_step(mesh, cfg)
    assert len(pi) == 2016
    re = jax.device_put(rng.normal(size=(b, n)).astype(np.float32), shardings[0])
    im = jax.device_put(rng.normal(size=(b, n)).astype(np.float32), shardings[1])
    anchors = rng.normal(scale=5_000.0, size=(b, 3)).astype(np.float32)
    anchors[:, 2] = 0.0
    out = step(re, im, jax.device_put(anchors, shardings[2]))
    assert np.asarray(out.fix_enu).shape == (3,)
    assert np.isfinite(np.asarray(out.cost))
    assert np.asarray(out.lags).shape[0] >= 2016


def test_pair_ep_fused_kernel_routing_matches_unfused():
    """VERDICT r2 item 8: the EP pair slice routed through the fused
    Pallas GCC kernel (interpret mode on CPU) matches the matmul path.

    The kernel's static pair table is satisfied by stacking the one-hot-
    gathered X/Y spectra as 2·P_loc pseudo-receivers with pairs (k, P+k).
    """
    from radio_mapper_tpu.ops import split_complex as sc_ops
    from radio_mapper_tpu.ops.pallas import gcc_kernel

    cfg = PairEPConfig(
        num_buoys=8, block_len=4096, sample_rate_hz=2_048_000.0, max_lag=256,
    )
    if not gcc_kernel.supported(
        gcc_kernel.plan_nfft(cfg.block_len + cfg.max_lag), cfg.weighting
    ):
        pytest.skip("fused planner does not support this length")
    scen = sim.default_scenario(
        block_len=4096, snr_db=25.0, seed=11, bandwidth_hz=500e3,
        buoys=[
            (f"b{k}", 35.40 + 0.05 * (k % 4), -97.60 + 0.06 * (k // 4), 0.0)
            for k in range(8)
        ],
    )
    cap = sim.synthesize(scen)
    mesh = _mesh()

    def run():
        step, shardings, (pi, pj) = build_pair_ep_step(mesh, cfg)
        re = jax.device_put(cap.iq.real.astype(np.float32), shardings[0])
        im = jax.device_put(cap.iq.imag.astype(np.float32), shardings[1])
        anchors = jax.device_put(cap.buoy_enu.astype(np.float32), shardings[2])
        return step(re, im, anchors), pi

    out_unfused, pi = run()
    sc_ops.set_gcc_fused("on")  # forces fused even off-TPU (interpret)
    try:
        out_fused, _ = run()
    finally:
        sc_ops.set_gcc_fused("auto")
    np.testing.assert_allclose(
        np.asarray(out_fused.lags)[: len(pi)],
        np.asarray(out_unfused.lags)[: len(pi)],
        atol=0.05,
    )
    np.testing.assert_allclose(
        np.asarray(out_fused.fix_enu), np.asarray(out_unfused.fix_enu), atol=5.0
    )


def test_pair_ep_output_carries_ellipse():
    """The EP step's replicated fix includes its error ellipse fields."""
    mesh = _mesh()
    rng = np.random.default_rng(1)
    cfg = PairEPConfig(
        num_buoys=8, block_len=1024, sample_rate_hz=2_048_000.0, max_lag=64,
        solver_iterations=8,
    )
    step, sh, _ = build_pair_ep_step(mesh, cfg)
    re = jax.device_put(rng.normal(size=(8, 1024)).astype(np.float32), sh[0])
    im = jax.device_put(rng.normal(size=(8, 1024)).astype(np.float32), sh[1])
    anchors = rng.normal(scale=5_000.0, size=(8, 3)).astype(np.float32)
    anchors[:, 2] = 0.0
    out = step(re, im, jax.device_put(anchors, sh[2]))
    major = float(np.asarray(out.ellipse_major_m))
    minor = float(np.asarray(out.ellipse_minor_m))
    brg = float(np.asarray(out.ellipse_orientation_deg))
    assert np.isfinite([major, minor, brg]).all()
    assert major >= minor >= 0.0
    assert 0.0 <= brg < 180.0
