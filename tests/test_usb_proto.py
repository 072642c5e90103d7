"""USB control-transfer protocol + RTL2832U driver against the
register-level device model.

These tests execute the reference's entire L0 software stack equivalent
(`Code/src/librtlsdr.c` open/init/tune/mode/EEPROM/stream protocol)
hardware-free: the driver in `net/usb_proto.py` speaks real control
transfers to `net/rtl2832u_model.py`, which decodes them the way the
silicon does. Golden values are recomputed independently here (two's
complement IF ratios, FIR bit packing, resampler register splits) so a
driver-side and model-side bug can't cancel out.
"""

import numpy as np
import pytest

from radio_mapper_tpu.net import tuner_plan
from radio_mapper_tpu.net.usb_proto import (
    Block, CTRL_IN, CTRL_OUT, ControlTransfer, EEPROM_I2C_ADDR, FIR_DEFAULT,
    R82XX_IF_FREQ_HZ, R828D_XTAL_FREQ_HZ, Rtl2832u, SysReg, TransportError,
    TunerType, UsbReg, decode_reg_value, encode_read_array, encode_reg_value,
    encode_write_array, identify_device, pack_fir,
)
from radio_mapper_tpu.net.rtl2832u_model import MockRtlUsbTransport
from radio_mapper_tpu.tools.eeprom import (
    DEFAULT_CONFIGS, generate_image, parse_image,
)
from radio_mapper_tpu.net.usb_proto import EEPROM_SIZE as EEPROM_SIZE_BYTES
from radio_mapper_tpu.tools.sdr_test import DropStats


def open_dev(tuner=TunerType.R820T, **kw):
    t = MockRtlUsbTransport(tuner, **kw)
    dev = Rtl2832u(t)
    dev.open()
    return t, dev


# --- wire framing (`librtlsdr.c:409-520`) -----------------------------------


def test_control_framing_golden():
    # read: wIndex = block << 8; write: | 0x10 (the write strobe)
    rd = encode_read_array(Block.IIC, 0x34, 1)
    assert (rd.request_type, rd.value, rd.index, rd.length) == (
        CTRL_IN, 0x34, 0x0600, 1)
    wr = encode_write_array(Block.SYS, SysReg.GPO, b"\x20")
    assert (wr.request_type, wr.value, wr.index, wr.data) == (
        CTRL_OUT, 0x3001, 0x0210, b"\x20")


def test_reg_value_byte_order():
    # writes are big-endian (hi, lo); 1-byte is the low byte
    assert encode_reg_value(0x1002, 2) == b"\x10\x02"
    assert encode_reg_value(0x1002, 1) == b"\x02"
    # reads decode little-endian (`librtlsdr.c:484`)
    assert decode_reg_value(b"\x02\x10") == 0x1002
    assert decode_reg_value(b"\x7f") == 0x7F


def test_fir_packing_golden():
    image = pack_fir(FIR_DEFAULT)
    assert len(image) == 20
    # int8 half round-trips directly
    assert [b - 256 if b >= 128 else b for b in image[:8]] == \
        list(FIR_DEFAULT[:8])
    # int12 half: unpack 3 bytes -> two 12-bit two's-complement taps,
    # reconstructed with different arithmetic than the packer uses
    taps = []
    for base in range(8, 20, 3):
        b0, b1, b2 = image[base], image[base + 1], image[base + 2]
        v0 = (b0 << 4) | (b1 >> 4)
        v1 = ((b1 & 0x0F) << 8) | b2
        taps += [v0 - 4096 if v0 >= 2048 else v0,
                 v1 - 4096 if v1 >= 2048 else v1]
    assert taps == list(FIR_DEFAULT[8:])


def test_fir_packing_random_roundtrip():
    """Property check over random in-range taps: pack → independent
    bit-level unpack recovers every tap exactly (200 draws)."""
    rng = np.random.default_rng(7)
    for _ in range(200):
        taps = list(rng.integers(-128, 128, 8)) + \
            list(rng.integers(-2048, 2048, 8))
        image = pack_fir(taps)
        got = [b - 256 if b >= 128 else b for b in image[:8]]
        for base in range(8, 20, 3):
            b0, b1, b2 = image[base], image[base + 1], image[base + 2]
            v0 = (b0 << 4) | (b1 >> 4)
            v1 = ((b1 & 0x0F) << 8) | b2
            got += [v0 - 4096 if v0 >= 2048 else v0,
                    v1 - 4096 if v1 >= 2048 else v1]
        assert got == [int(v) for v in taps]


def test_eeprom_random_images_roundtrip():
    """Random byte images survive driver write → driver read through
    the pointered I2C model (sequential-read semantics)."""
    rng = np.random.default_rng(11)
    _, dev = open_dev()
    for _ in range(5):
        img = rng.integers(0, 256, EEPROM_SIZE_BYTES).astype(np.uint8).tobytes()
        dev.write_eeprom(img)
        assert dev.read_eeprom(0, EEPROM_SIZE_BYTES) == img
        # partial window read matches the slice
        assert dev.read_eeprom(37, 41) == img[37:78]


def test_fir_range_errors():
    bad8 = list(FIR_DEFAULT)
    bad8[0] = 200
    with pytest.raises(ValueError):
        pack_fir(bad8)
    bad12 = list(FIR_DEFAULT)
    bad12[15] = 3000
    with pytest.raises(ValueError):
        pack_fir(bad12)


# --- open / probe (`librtlsdr.c:1407-1602`) ---------------------------------


@pytest.mark.parametrize("tuner", [
    TunerType.E4000, TunerType.FC0012, TunerType.FC0013,
    TunerType.FC2580, TunerType.R820T, TunerType.R828D,
])
def test_probe_identifies_every_tuner(tuner):
    t, dev = open_dev(tuner)
    assert dev.tuner_type == tuner
    # the repeater must be released after open (`librtlsdr.c:1589`)
    assert not t.repeater_on()


def test_probe_no_tuner_falls_back_to_direct_sampling():
    t, dev = open_dev(None)
    assert dev.tuner_type == TunerType.UNKNOWN
    assert dev.direct_sampling == 1
    # direct-sampling register state (`librtlsdr.c:1164-1177`)
    assert t.demod_byte(1, 0xB1) == 0x1A
    assert t.demod_byte(0, 0x08) == 0x4D
    assert t.demod_byte(0, 0x06) == 0x80


def test_r82xx_low_if_configuration():
    """R820T runs low-IF: I-ADC only, 3.57 MHz IF, spectrum inversion
    (`librtlsdr.c:1559-1575`)."""
    t, dev = open_dev(TunerType.R820T)
    assert t.demod_byte(1, 0xB1) == 0x1A
    assert t.demod_byte(0, 0x08) == 0x4D
    assert t.demod_byte(1, 0x15) == 0x01
    # IF ratio registers: two's complement of (f * 2^22 / xtal)
    if_reg = -((R82XX_IF_FREQ_HZ * (1 << 22)) // tuner_plan.DEFAULT_RTL_XTAL_HZ)
    expect = ((if_reg >> 16) & 0x3F, (if_reg >> 8) & 0xFF, if_reg & 0xFF)
    got = (t.demod_byte(1, 0x19), t.demod_byte(1, 0x1A), t.demod_byte(1, 0x1B))
    assert got == expect


def test_r828d_uses_16mhz_tuner_xtal():
    _, dev = open_dev(TunerType.R828D)
    assert dev.tun_xtal_hz == R828D_XTAL_FREQ_HZ
    assert dev.rtl_xtal_hz == tuner_plan.DEFAULT_RTL_XTAL_HZ


def test_stalled_device_is_reset_then_opens():
    """Failed dummy write → device reset → bring-up continues
    (`librtlsdr.c:1493-1496`)."""
    t = MockRtlUsbTransport(TunerType.R820T, fail_first_write=True)
    dev = Rtl2832u(t)
    dev.open()
    assert t.resets == 1
    assert dev.tuner_type == TunerType.R820T


def test_init_baseband_register_state():
    t, dev = open_dev(TunerType.E4000)  # E4000 leaves baseband untouched
    # USB endpoint A config (`librtlsdr.c:620-622`)
    assert t.block_reg(Block.USB, UsbReg.SYSCTL) == 0x09
    assert (t.block_reg(Block.USB, UsbReg.EPA_CTL),
            t.block_reg(Block.USB, UsbReg.EPA_CTL + 1)) == (0x10, 0x02)
    # demod powered (`librtlsdr.c:625-626`)
    assert t.block_reg(Block.SYS, SysReg.DEMOD_CTL) == 0xE8
    assert t.block_reg(Block.SYS, SysReg.DEMOD_CTL_1) == 0x22
    # SDR mode, DAGC off; zero-IF + DC/IQ estimation on
    assert t.demod_byte(0, 0x19) == 0x05
    assert t.demod_byte(1, 0xB1) == 0x1B
    # the full default FIR image sits at page 1 regs 0x1c-0x2f
    image = pack_fir(FIR_DEFAULT)
    assert bytes(t.demod_byte(1, 0x1C + i) for i in range(20)) == image


def test_tuner_probe_requires_repeater():
    """Tuner I2C traffic with the repeater off must fail — guards the
    driver's repeater sequencing (`librtlsdr.c:583, 1501`)."""
    t = MockRtlUsbTransport(TunerType.R820T)
    dev = Rtl2832u(t)
    with pytest.raises(TransportError):
        dev.i2c_read_reg(0x34, 0x00)


# --- sample rate / IF / ppm -------------------------------------------------


def test_set_sample_rate_registers_match_plan():
    t, dev = open_dev()
    real = dev.set_sample_rate(2_048_000)
    plan = tuner_plan.plan_sample_rate(2_048_000)
    assert real == plan.real_rate_hz == 2_048_000.0
    got = ((t.demod_byte(1, 0x9F) << 24) | (t.demod_byte(1, 0xA0) << 16)
           | (t.demod_byte(1, 0xA1) << 8) | t.demod_byte(1, 0xA2))
    assert got == plan.rsamp_ratio
    # soft-reset pulse must end deasserted
    assert t.demod_byte(1, 0x01) == 0x10


def test_set_sample_rate_quantization():
    _, dev = open_dev()
    real = dev.set_sample_rate(1_000_000)  # 28.8e6·2²²/1e6 is fractional
    assert real != 1_000_000
    assert abs(real - 1_000_000) < 10  # a few Hz of resampler quantization


def test_invalid_sample_rate_rejected():
    _, dev = open_dev()
    with pytest.raises(tuner_plan.PlanError):
        dev.set_sample_rate(500_000)  # inside the resampler's dead band


def test_freq_correction_registers():
    t, dev = open_dev()
    dev.set_freq_correction(25)
    offs = int(-25 * (1 << 24) / 1_000_000)
    assert t.demod_byte(1, 0x3F) == offs & 0xFF
    assert t.demod_byte(1, 0x3E) == (offs >> 8) & 0x3F


# --- tuning -----------------------------------------------------------------


def test_set_center_freq_programs_tuner_lo():
    t, dev = open_dev(TunerType.R820T)
    achieved = dev.set_center_freq(100_000_000)
    # plan burst reached the chip, repeater released afterwards
    assert len(t.tuner_chip.lo_plans) == 1
    assert not t.repeater_on()
    # achieved LO after IF compensation: within the R82xx sigma-delta
    # quantization step (~879 Hz/LSB)
    assert abs(achieved - 100_000_000) < 1_000
    plan = tuner_plan.plan_r82xx_pll(100_000_000 + R82XX_IF_FREQ_HZ)
    assert t.tuner_chip.lo_plans[0] == tuple(
        int(plan.params[k]) & 0xFFFFFFFF for k in sorted(plan.params))


@pytest.mark.parametrize("tuner,freq", [
    (TunerType.E4000, 100e6), (TunerType.FC0012, 200e6),
    (TunerType.FC0013, 433.92e6), (TunerType.FC2580, 868e6),
    (TunerType.R820T, 121.5e6), (TunerType.R828D, 1090e6),
])
def test_every_tuner_family_tunes(tuner, freq):
    """set_center_freq must route through each family's PLL planner and
    land within its quantization step (kHz-class worst case)."""
    t, dev = open_dev(tuner)
    achieved = dev.set_center_freq(int(freq))
    assert len(t.tuner_chip.lo_plans) == 1
    assert abs(achieved - freq) < 2_000
    assert not t.repeater_on()


def test_direct_sampling_tunes_2832_if():
    t, dev = open_dev(None)  # no tuner → direct sampling
    achieved = dev.set_center_freq(14_200_000)
    assert achieved == tuner_plan.plan_if_freq(14_200_000)
    assert abs(achieved - 14_200_000) < 7  # 2^22 ratio quantization


def test_offset_tuning_e4000_and_r82xx_refusal():
    t, dev = open_dev(TunerType.E4000)
    dev.set_sample_rate(2_048_000)
    dev.set_offset_tuning(True)
    assert dev.offs_freq_hz == tuner_plan.offset_tuning_offs_hz(2_048_000)
    _, dev_r = open_dev(TunerType.R820T)
    with pytest.raises(TransportError):
        dev_r.set_offset_tuning(True)  # `librtlsdr.c:1227-1231`


def test_gain_snaps_to_tuner_table():
    t, dev = open_dev(TunerType.R820T)
    snapped = dev.set_tuner_gain(400)
    assert snapped == tuner_plan.nearest_gain(400, "r820t")
    assert t.tuner_chip.gain_writes == [snapped]
    assert snapped in dev.get_tuner_gains()


# --- modes + streaming ------------------------------------------------------


def test_counter_testmode_feeds_drop_detector():
    """Test mode → bulk endpoint emits the uint8 ramp; the rtl_test-
    equivalent drop detector sees zero loss across block boundaries
    (`librtlsdr.c:1135-1141`, `rtl_test.c:109-135`)."""
    t, dev = open_dev()
    dev.set_testmode(True)
    assert t.testmode_on()
    stats = DropStats()
    for _ in range(4):
        block = np.frombuffer(dev.read_sync(4096), np.uint8)
        stats.update(block)
    assert stats.total_bytes == 16384
    assert stats.lost_bytes == 0 and stats.gaps == 0
    dev.set_testmode(False)
    assert not t.testmode_on()
    # idle ADC returns mid-scale, not the ramp
    assert set(dev.read_sync(16)) == {128}


def test_agc_mode_register():
    t, dev = open_dev()
    dev.set_agc_mode(True)
    assert t.demod_byte(0, 0x19) == 0x25
    dev.set_agc_mode(False)
    assert t.demod_byte(0, 0x19) == 0x05


def test_direct_sampling_q_branch_swap():
    t, dev = open_dev(TunerType.E4000)
    dev.set_direct_sampling(2)
    assert t.demod_byte(0, 0x06) == 0x90  # I/Q ADC swap (`librtlsdr.c:1174`)
    dev.set_direct_sampling(0)
    assert t.demod_byte(0, 0x06) == 0x80
    assert dev.direct_sampling == 0


# --- EEPROM (`librtlsdr.c:825-886` + `rtl_eeprom.c` codec) ------------------


def test_eeprom_full_stack_roundtrip():
    """Factory image preloaded in the model → driver byte reads →
    rtl_eeprom codec parse: the complete `rtl_eeprom -r` path."""
    image = generate_image(DEFAULT_CONFIGS["realtek_oem"])
    _, dev = open_dev(TunerType.R820T, eeprom_image=image)
    conf = parse_image(dev.read_eeprom(0, 256))
    assert (conf.vendor_id, conf.product_id) == (0x0BDA, 0x2838)
    assert conf.manufacturer == "Realtek"
    assert identify_device(conf.vendor_id, conf.product_id) \
        == "Generic RTL2832U OEM"


def test_eeprom_write_is_differs_only():
    image = generate_image(DEFAULT_CONFIGS["realtek"])
    t, dev = open_dev(eeprom_image=image)
    new = bytearray(image)
    new[2:4] = (0x0BDA).to_bytes(2, "little")
    new[4:6] = (0x2838).to_bytes(2, "little")
    written = dev.write_eeprom(bytes(new))
    # only the product-id byte actually differs between the two presets'
    # headers here; differs-only programming writes just the changed bytes
    diff = sum(a != b for a, b in zip(image, new))
    assert written == diff > 0
    assert dev.read_eeprom(0, 256) == bytes(new)


def test_eeprom_bounds():
    _, dev = open_dev()
    with pytest.raises(ValueError):
        dev.read_eeprom(250, 10)
    with pytest.raises(ValueError):
        dev.write_eeprom(b"\x00" * 10, offset=250)


def test_l0_to_l1_chain_dongle_to_rtl_tcp_wire():
    """Full L0→L1 integration: modeled dongle in counter test mode →
    Rtl2832u driver → Rtl2832uSource decode → RtlTcpServer uint8
    re-encode → stock rtl_tcp client — the 8-bit ramp must survive the
    whole stack byte-exact (encode∘decode is the identity on counts),
    so the rtl_test drop criterion holds end-to-end."""
    from radio_mapper_tpu.ingest.sources import Rtl2832uSource
    from radio_mapper_tpu.net import rtl_tcp

    _, dev = open_dev(TunerType.R820T)
    src = Rtl2832uSource(dev, sample_rate_hz=2_048_000,
                         center_frequency_hz=121_500_000)
    assert abs(src.achieved_lo_hz - 121_500_000) < 1_000
    dev.set_testmode(True)
    server = rtl_tcp.RtlTcpServer(src, host="127.0.0.1", port=18849,
                                  throttle=False)
    rtl_tcp.serve_in_thread(server)
    client = rtl_tcp.RtlTcpClient("127.0.0.1", 18849)
    try:
        stats = DropStats()
        for _ in range(4):
            iq = client.read_iq(4096)
            # re-encode the wire payload back to counts: identical ramp
            from radio_mapper_tpu.ops import iq as iq_ops

            stats.update(iq_ops.encode_uint8_iq_numpy(np.asarray(iq)))
        assert stats.total_bytes == 4 * 2 * 4096
        assert stats.lost_bytes == 0 and stats.gaps == 0
    finally:
        client.close()


def test_rtl2832u_source_rate_assignment_programs_dongle():
    """rtl_tcp's CMD_SET_SAMPLE_RATE handler assigns
    `source.sample_rate_hz` directly — the property setter must program
    the dongle resampler and store the ACHIEVED (quantized) rate."""
    from radio_mapper_tpu.ingest.sources import Rtl2832uSource
    from radio_mapper_tpu.net import tuner_plan

    _, dev = open_dev(TunerType.R820T)
    src = Rtl2832uSource(dev, sample_rate_hz=2_048_000)
    assert dev.rate_hz == 2_048_000
    src.sample_rate_hz = 1_000_000  # quantizes (28.8e6*2^22/1e6 fractional)
    plan = tuner_plan.plan_sample_rate(1_000_000)
    assert src.sample_rate_hz == plan.real_rate_hz != 1_000_000
    assert dev.rate_hz == int(plan.real_rate_hz)


def test_cli_usbprobe_smoke(capsys):
    """The usbprobe subcommand drives the full bring-up and reports a
    clean counter test for any tuner choice."""
    from radio_mapper_tpu.cli import main

    main(["usbprobe", "--tuner", "r828d", "--freq", "1090e6"])
    out = capsys.readouterr().out
    assert "tuner: R828D" in out
    assert "0 lost, 0 gaps" in out
    assert "LO error" in out


# --- bus enumeration + device search (`librtlsdr.c:1275-1404`,
# --- `convenience.c:244-303`) -----------------------------------------------


def make_bus():
    """Two dongles with distinct serials, sandwiched between non-RTL
    devices that enumeration must skip."""
    from radio_mapper_tpu.net.rtl2832u_model import MockUsbBus
    from radio_mapper_tpu.tools.eeprom import EepromConfig, generate_image

    bus = MockUsbBus()
    bus.add_other_device(0x1D6B, 0x0002, "xHCI root hub")
    bus.add_dongle(TunerType.R820T, generate_image(
        EepromConfig(0x0BDA, 0x2838, "Realtek", "RTL2838UHIDIR",
                     "00000101", True, False, True)))
    bus.add_other_device(0x046D, 0xC31C, "keyboard")
    bus.add_dongle(TunerType.E4000, generate_image(
        EepromConfig(0x0BDA, 0x2832, "Generic", "RTL2832U DVB-T",
                     "buoy-07", True, False, True)))
    return bus


def test_enumeration_skips_non_dongles():
    from radio_mapper_tpu.net import usb_proto as up

    bus = make_bus()
    assert up.get_device_count(bus) == 2
    assert up.get_device_name(bus, 0) == "Generic RTL2832U OEM"
    assert up.get_device_name(bus, 1) == "Generic RTL2832U"
    assert up.get_device_name(bus, 2) == ""  # out of range -> ''
    assert up.get_device_usb_strings(bus, 1) == (
        "Generic", "RTL2832U DVB-T", "buoy-07")


def test_index_by_serial():
    from radio_mapper_tpu.net import usb_proto as up
    from radio_mapper_tpu.net.rtl2832u_model import MockUsbBus

    bus = make_bus()
    assert up.get_index_by_serial(bus, "buoy-07") == 1
    assert up.get_index_by_serial(bus, "nope") == -3
    assert up.get_index_by_serial(MockUsbBus(), "x") == -2


def test_device_search_index_exact_prefix_suffix():
    from radio_mapper_tpu.net import usb_proto as up

    bus = make_bus()
    assert up.device_search(bus, "1") == 1            # raw index
    assert up.device_search(bus, "00000101") == 0     # exact serial
    assert up.device_search(bus, "buoy") == 1         # prefix
    assert up.device_search(bus, "-07") == 1          # suffix
    assert up.device_search(bus, "absent") == -1


def test_device_search_zero_padded_serial_is_not_an_index():
    """Deliberate deviation from convenience.c's strtol base-0 parse:
    the common factory serial "00000001" must select the dongle carrying
    that serial, not be read as octal index 1 (documented in
    device_search)."""
    from radio_mapper_tpu.net import usb_proto as up
    from radio_mapper_tpu.net.rtl2832u_model import MockUsbBus
    from radio_mapper_tpu.tools.eeprom import EepromConfig, generate_image

    bus = MockUsbBus()
    bus.add_dongle(TunerType.R820T, generate_image(
        EepromConfig(0x0BDA, 0x2838, "Realtek", "RTL2838UHIDIR",
                     "00000001", True, False, True)))
    bus.add_dongle(TunerType.E4000, generate_image(
        EepromConfig(0x0BDA, 0x2832, "Generic", "RTL2832U DVB-T",
                     "00000002", True, False, True)))
    assert up.device_search(bus, "00000001") == 0   # serial, not octal 1
    assert up.device_search(bus, "1") == 1          # plain index still works
    assert up.device_search(bus, "0x1") == 1        # hex literal too
    assert up.device_search(bus, " 1") == -1        # whitespace is no index
    assert up.device_search(bus, "0b1") == -1       # 0b/0o/underscore forms
    assert up.device_search(bus, "0_1") == -1       # are serials, not indices


def test_mock_bus_rejects_negative_and_out_of_range_slots():
    """Error codes (-1/-2/-3) passed straight into open() must raise,
    never silently open devices[-1]."""
    bus = make_bus()
    for slot in (-1, -2, -3, 99):
        with pytest.raises(TransportError):
            bus.open(slot)


def test_open_device_by_index_brings_up_the_right_dongle():
    from radio_mapper_tpu.net import usb_proto as up

    bus = make_bus()
    dev = up.open_device(bus, up.device_search(bus, "buoy-07"))
    assert dev.tuner_type == TunerType.E4000
    dev0 = up.open_device(bus, 0)
    assert dev0.tuner_type == TunerType.R820T
    with pytest.raises(TransportError):
        up.open_device(bus, 5)
