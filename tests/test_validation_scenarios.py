"""Offline algorithm validation: the reference's scenario harness, upgraded.

Mirrors `tests/test_tdoa_validation.py` of the reference (simulated OKC
buoy network, fabricated geometric detections, timing-error sweeps,
geometry sweeps, real-world emergency scenarios) — but run against the
waveform pipeline as well as the timestamp engine, with the reference's
own published accuracy numbers (`Documents/TDOA_README.md:55-64`) as the
bar to beat.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from radio_mapper_tpu import geo, sim, solver
from radio_mapper_tpu.constants import SPEED_OF_LIGHT_M_S
from radio_mapper_tpu.models.pipeline import PipelineConfig, TDOAPipeline
from radio_mapper_tpu.ops.gcc_phat import pair_indices


def _waveform_fix_error(scen: sim.Scenario, max_lag=600, dwells=1) -> float:
    cap = sim.synthesize(scen)
    pipe = TDOAPipeline(
        PipelineConfig(
            num_buoys=len(scen.buoys),
            block_len=scen.block_len // dwells,
            sample_rate_hz=scen.sample_rate_hz,
            max_lag=max_lag,
            power_offset_db=40.0,
            solver_starts=4,
            correlation_dwells=dwells,
        )
    )
    out = pipe.jit_step()(
        jnp.asarray(cap.iq, jnp.complex64), jnp.asarray(cap.buoy_enu, jnp.float32)
    )
    est = np.asarray(out.fix.position_enu)
    return float(np.linalg.norm(est[:2] - cap.emitter_enu[0][:2]))


class TestTimingErrorSweep:
    """Reference: 284.8 m @ 1 µs, 11,947 m @ 100 µs (timestamp method)."""

    @pytest.mark.parametrize(
        "jitter_s,bound_m",
        [
            (0.0, 30.0),
            (1e-7, 60.0),     # 100 ns
            (1e-6, 500.0),    # 1 µs — reference's only "working" case
        ],
    )
    def test_waveform_pipeline_under_clock_jitter(self, jitter_s, bound_m):
        errs = []
        for seed in range(3):
            scen = sim.default_scenario(
                signal="noise", bandwidth_hz=150e3, snr_db=25.0,
                timing_jitter_s=jitter_s, seed=100 + seed,
            )
            errs.append(_waveform_fix_error(scen))
        assert float(np.median(errs)) < bound_m, errs


class TestGeometrySweep:
    """Reference: square 86.1 m, triangle 210.7 m (with its timing noise)."""

    def _geom_error(self, buoys, emitter=(35.45, -97.52)):
        scen = sim.default_scenario(
            buoys=buoys, emitter_lat=emitter[0], emitter_lng=emitter[1],
            signal="noise", bandwidth_hz=150e3, snr_db=25.0, seed=7,
        )
        return _waveform_fix_error(scen)

    def test_square(self):
        assert self._geom_error(sim.OKC_BUOYS) < 86.1  # beat the reference

    def test_triangle(self):
        buoys = (
            ("t1", 35.5513, -97.5322, 0.0),
            ("t2", 35.3842, -97.4322, 0.0),
            ("t3", 35.3842, -97.6322, 0.0),
        )
        assert self._geom_error(buoys) < 210.7  # beat the reference

    def test_linear_bounded(self):
        buoys = (
            ("l1", 35.40, -97.70, 0.0),
            ("l2", 35.40, -97.55, 0.0),
            ("l3", 35.40, -97.40, 0.0),
        )
        # Degenerate geometry: must stay bounded (the reference diverged).
        err = self._geom_error(buoys, emitter=(35.45, -97.52))
        assert np.isfinite(err) and err < 20_000


class TestRealWorldScenarios:
    """121.5 MHz aviation ELT / 156.8 MHz marine / 406.025 MHz EPIRB."""

    @pytest.mark.parametrize(
        "freq_mhz,signal,bw,dwells,bound",
        [
            # ELT: swept audio tone → modeled as a chirp (a pure unmodulated
            # tone carries no timing information at all — infinite TDOA
            # ambiguity — which is exactly why real beacons sweep). The
            # 5 kHz class is CRLB-limited to km-scale in ONE 16 ms dwell
            # (CRLB ∝ 1/BW); narrowband mode integrates 8 dwells as one
            # coherent 128 ms correlation (`correlation_dwells`) and lands
            # inside the reference's MVP target <500 m
            # (`Documents/TDOA_README.md:107-110`) — vs 2500 m in r2.
            (121.5, "chirp", 5e3, 8, 500.0),
            (156.8, "fm", 16e3, 1, 800.0),      # marine voice channel
            (406.025, "bpsk", 50e3, 1, 285.0),  # EPIRB burst: phase-modulated
        ],
    )
    def test_emergency_band_fix(self, freq_mhz, signal, bw, dwells, bound):
        scen = sim.Scenario(
            buoys=tuple(sim.Buoy(b, la, ln, al) for b, la, ln, al in sim.OKC_BUOYS),
            emitters=(
                sim.Emitter(
                    lat=35.46, lng=-97.50, signal=signal, bandwidth_hz=bw,
                    freq_offset_hz=12_000.0,
                ),
            ),
            center_frequency_mhz=freq_mhz,
            sample_rate_hz=2_048_000.0,
            block_len=32_768 * dwells,  # longer dwell for narrowband accuracy
            snr_db=22.0,
            seed=11,
        )
        err = _waveform_fix_error(scen, dwells=dwells)
        # Narrowband signals carry less timing information; all classes must
        # beat the reference's 1 µs-case 284.8 m or its <500 m MVP bar.
        assert err < bound, (freq_mhz, err)


class TestMultiEmitter:
    def test_two_emitters_in_different_subchannels(self):
        """Two simultaneous emitters at distinct offsets: the channelized
        streaming pipeline localizes both — impossible in the reference's
        one-frequency-at-a-time design."""
        from radio_mapper_tpu.models.streaming_tdoa import (
            StreamingTDOA,
            StreamingTDOAConfig,
        )

        scen = sim.Scenario(
            buoys=tuple(sim.Buoy(b, la, ln, al) for b, la, ln, al in sim.OKC_BUOYS),
            emitters=(
                sim.Emitter(lat=35.46, lng=-97.55, signal="noise",
                            bandwidth_hz=90e3, freq_offset_hz=-512_000.0),
                sim.Emitter(lat=35.50, lng=-97.46, signal="noise",
                            bandwidth_hz=90e3, freq_offset_hz=512_000.0),
            ),
            sample_rate_hz=2_048_000.0,
            block_len=32_768,
            snr_db=25.0,
            seed=13,
        )
        cap = sim.synthesize(scen)
        st = StreamingTDOA(
            StreamingTDOAConfig(
                num_buoys=4, num_subchannels=8,
                sample_rate_hz=scen.sample_rate_hz, block_len=32_768,
                max_lag=8, solver_iterations=25,
            )
        )
        state = st.init_state()
        _, out = st.jit_step()(
            state, jnp.asarray(cap.iq, jnp.complex64),
            jnp.asarray(cap.buoy_enu, jnp.float32),
        )
        # Sub-channel centers: fftshifted offsets of fs/8 = 256 kHz spacing;
        # emitters at ∓512 kHz land in distinct channels.
        w = np.asarray(out.weights).sum(axis=-1)
        top2 = np.argsort(w)[-2:]
        fixes = np.asarray(out.fixes_enu)[top2, :2]
        truths = cap.emitter_enu[:, :2]
        # Each top channel's fix matches one distinct emitter.
        d = np.linalg.norm(fixes[:, None, :] - truths[None, :, :], axis=-1)
        best = d.min(axis=1)
        which = d.argmin(axis=1)
        assert set(which) == {0, 1}, d
        assert np.all(best < 1500.0), d  # sub-channel rate ⇒ km-class per sample
