"""Host-side register planning tests (librtlsdr / tuner math parity).

Golden values are computed from the reference equations
(`Code/src/librtlsdr.c:1075-1126`, `Code/src/tuner_r82xx.c:417-552`,
`Code/src/tuner_e4k.c:481-531`) — all integer arithmetic, so exact.
"""

import pytest

from radio_mapper_tpu.net import tuner_plan as tp


class TestSampleRate:
    def test_2048k_is_exact(self):
        plan = tp.plan_sample_rate(2_048_000)
        assert plan.rsamp_ratio == 58_982_400
        assert plan.real_rate_hz == pytest.approx(2_048_000.0, abs=1e-6)
        assert plan.rate_error_ppm == pytest.approx(0.0, abs=1e-9)

    def test_2400k_is_exact(self):
        plan = tp.plan_sample_rate(2_400_000)
        assert plan.rsamp_ratio == 50_331_648
        assert plan.real_rate_hz == pytest.approx(2_400_000.0, abs=1e-6)

    def test_quantized_rate_reported(self):
        # 2.5 MS/s does not divide the 28.8 MHz clock tree exactly.
        plan = tp.plan_sample_rate(2_500_000)
        assert plan.real_rate_hz != 2_500_000.0
        assert abs(plan.real_rate_hz - 2_500_000.0) < 1.0  # sub-Hz quantization
        assert plan.rsamp_ratio % 4 == 0  # low bits masked (librtlsdr.c:1093)

    def test_low_rate_bit27_path(self):
        # (225k, 300k] rates exercise the bit-27 mirror (librtlsdr.c:1095).
        plan = tp.plan_sample_rate(250_000)
        assert plan.rsamp_ratio & 0x08000000
        assert abs(plan.real_rate_hz - 250_000.0) < 0.01

    @pytest.mark.parametrize("bad", [225_000, 100_000, 500_000, 3_300_000])
    def test_rejected_rates(self, bad):
        # librtlsdr.c:1086-1090: <=225k, (300k,900k], >3.2M all invalid.
        with pytest.raises(tp.PlanError):
            tp.plan_sample_rate(bad)

    def test_ppm_scales_rate(self):
        base = tp.plan_sample_rate(2_048_000)
        off = tp.plan_sample_rate(2_048_000, ppm=10.0)
        assert off.real_rate_hz == pytest.approx(
            base.real_rate_hz * (1 + 10e-6), rel=1e-7)


class TestR82xxPll:
    def test_100mhz_hand_computed(self):
        # Hand-run of tuner_r82xx.c:455-524 at 100 MHz / 28.8 MHz xtal:
        # mix_div=32, nint=55, vco_fra=32000 kHz, sdm=36408.
        plan = tp.plan_r82xx_pll(100_000_000)
        assert plan.params["mix_div"] == 32
        assert plan.params["nint"] == 55
        assert plan.params["sdm"] == 36_408
        granularity = 2 * 28_800_000 / 65_536 / 32
        assert abs(plan.error_hz) <= 2 * granularity

    @pytest.mark.parametrize("freq", [28e6, 100e6, 121.5e6, 433.92e6,
                                      915e6, 1090e6, 1700e6])
    def test_lo_error_within_sdm_granularity(self, freq):
        plan = tp.plan_r82xx_pll(freq)
        md = plan.params["mix_div"]
        granularity = 2 * 28_800_000 / 65_536 / md
        assert abs(plan.error_hz) <= 2 * granularity

    def test_integer_n_is_exact(self):
        # 57.6 MHz·k/mix_div frequencies need no SDM: zero error.
        # nint=60, mix_div=32: f = 57.6e6*60/32 = 108 MHz exactly.
        plan = tp.plan_r82xx_pll(108_000_000)
        assert plan.params["sdm"] == 0
        assert plan.error_hz == pytest.approx(0.0, abs=1e-6)

    def test_ni_si_registers(self):
        plan = tp.plan_r82xx_pll(100_000_000)
        ni, si, nint = (plan.params[k] for k in ("ni", "si", "nint"))
        assert nint == 4 * ni + si + 13  # tuner_r82xx.c:497-498 inverse


class TestE4kPll:
    @pytest.mark.parametrize("freq", [60e6, 100e6, 121.5e6, 406.025e6,
                                      915e6, 1700e6])
    def test_lo_error_within_x_granularity(self, freq):
        plan = tp.plan_e4k_pll(freq)
        r = plan.params["r"]
        granularity = 28_800_000 / 65_536 / r
        assert abs(plan.error_hz) <= 2 * granularity

    def test_band_table_selection(self):
        # 100 MHz < 108.3 MHz bound → R=32 (tuner_e4k.c:361).
        assert tp.plan_e4k_pll(100e6).params["r"] == 32
        # 800 MHz → last table row, R=4; >1.2 GHz → implicit R=2.
        assert tp.plan_e4k_pll(800e6).params["r"] == 4
        assert tp.plan_e4k_pll(1700e6).params["r"] == 2

    def test_known_tuning_gap_rejected(self):
        # The E4000's real ~1.1-1.25 GHz gap: R=4 puts Fvco above 3.9 GHz
        # (tuner_e4k.c:373-380 fails there, and so do we).
        with pytest.raises(tp.PlanError, match="Fvco"):
            tp.plan_e4k_pll(1e9)


class TestGains:
    def test_nearest_gain_r820t(self):
        assert tp.nearest_gain(280) == 280
        assert tp.nearest_gain(300) == 297
        assert tp.nearest_gain(-50) == 0
        assert tp.nearest_gain(9_999) == 496

    def test_nearest_gain_e4000(self):
        assert tp.nearest_gain(100, "e4000") == 90

    def test_unknown_tuner(self):
        with pytest.raises(tp.PlanError):
            tp.nearest_gain(100, "nope")


class TestCapturePlan:
    def test_plan_capture_fields(self):
        plan = tp.plan_capture(121_500_000, 2_400_000, gain_tenth_db=300)
        assert plan.gain_tenth_db == 297
        assert plan.sample_rate.real_rate_hz == pytest.approx(2_400_000.0)
        md = plan.lo.params["mix_div"]
        assert abs(plan.lo_error_hz) <= 2 * (2 * 28_800_000 / 65_536 / md)

    def test_fc_series_planned(self):
        plan = tp.plan_capture(100e6, 2_048_000, tuner="fc0013")
        # LO now modeled: sub-sample-grade granularity, not assumed exact.
        assert 0.0 < abs(plan.lo.error_hz) < 2_000.0
        assert plan.gain_tenth_db in tp.TUNER_GAINS["fc0013"]


class TestFcSeriesPll:
    """FC0012/FC0013/FC2580 PLL models (`tuner_fc0012.c:150-255`,
    `tuner_fc0013.c:194-352`, `tuner_fc2580.c:195-230`)."""

    def test_fc0012_band_multipliers(self):
        # freq·multi just under 3.56 GHz band edges (tuner_fc0012.c:160-200)
        assert tp.plan_fc0012_pll(30e6).params["multi"] == 96
        assert tp.plan_fc0012_pll(100e6).params["multi"] == 32
        assert tp.plan_fc0012_pll(250e6).params["multi"] == 12
        assert tp.plan_fc0012_pll(700e6).params["multi"] == 4

    def test_fc0013_extends_to_div2(self):
        assert tp.plan_fc0013_pll(900e6).params["multi"] == 4
        assert tp.plan_fc0013_pll(1_100e6).params["multi"] == 2

    def test_fc001x_lo_quantization_small(self):
        # sigma-delta step = xtal_div2/32768 at VCO → Hz-scale at LO; the
        # kHz truncation in the C math bounds the worst case under ~1 kHz.
        for f in (50e6, 121.5e6, 406.025e6, 850e6):
            p = tp.plan_fc0013_pll(f)
            assert abs(p.error_hz) < 1_000.0, (f, p.error_hz)
            # divider consistency: reconstructed VCO within one SDM step
            step = p.params["xtal_div2"] / 32768
            assert abs(p.actual_hz * p.params["multi"] -
                       f * p.params["multi"]) < p.params["multi"] * 1_000

    def test_fc0012_rejects_unreachable(self):
        # Very low frequency: pm sinks below 0x0b → PlanError
        with pytest.raises(tp.PlanError):
            tp.plan_fc0012_pll(2e6)

    def test_fc2580_bands_and_quantization(self):
        vhf = tp.plan_fc2580_pll(200e6)
        assert vhf.params["multi"] == 12
        uhf = tp.plan_fc2580_pll(600e6)
        assert uhf.params["multi"] == 4
        lband = tp.plan_fc2580_pll(1_500e6)
        assert lband.params["multi"] == 2
        # 20-bit fractional-N: LO error under f_comp/2^20/multi + rounding
        for p in (vhf, uhf, lband):
            assert abs(p.error_hz) < 2_000.0

    def test_if_freq_and_offset_tuning_math(self):
        # 22-bit IF quantization (librtlsdr.c:704): ~6.87 Hz granularity
        eff = tp.plan_if_freq(3_570_000)
        assert abs(eff - 3_570_000) < 28_800_000 / (1 << 22)
        # keenerd offset: (rate/2)*1.7 (librtlsdr.c:1237)
        assert tp.offset_tuning_offs_hz(2_048_000) == 1_740_800
        assert tp.offset_tuning_offs_hz(250_000) == 212_500
