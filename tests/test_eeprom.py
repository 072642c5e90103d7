"""EEPROM image codec tests (`Code/src/rtl_eeprom.c` format parity)."""

import dataclasses

import pytest

from radio_mapper_tpu.tools import eeprom


def test_roundtrip_all_presets():
    for name, conf in eeprom.DEFAULT_CONFIGS.items():
        img = eeprom.generate_image(conf)
        assert len(img) == eeprom.EEPROM_SIZE
        back = eeprom.parse_image(img)
        assert back == conf, name


def test_image_layout_realtek():
    # Byte-level spot checks against rtl_eeprom.c:156-166 semantics.
    img = eeprom.generate_image(eeprom.DEFAULT_CONFIGS["realtek"])
    assert img[0] == 0x28 and img[1] == 0x32
    assert img[2] | (img[3] << 8) == 0x0BDA
    assert img[4] | (img[5] << 8) == 0x2832
    assert img[6] == 0xA5  # have_serial
    assert img[7] == 0x14 | 0x01  # base | remote_wakeup, no IR
    assert img[8] == 0x02
    # First string descriptor at 0x09: len, 0x03, 'G', 0, 'e', 0 ...
    assert img[0x09] == 2 + 2 * len("Generic")
    assert img[0x0A] == 0x03
    assert img[0x0B:0x0B + 4] == b"G\x00e\x00"
    assert img[78] == 0x00  # IR config length


def test_flags_byte():
    conf = dataclasses.replace(
        eeprom.DEFAULT_CONFIGS["realtek"], enable_ir=True, remote_wakeup=False,
        have_serial=False)
    img = eeprom.generate_image(conf)
    assert img[6] == 0x00
    assert img[7] == 0x14 | 0x02
    back = eeprom.parse_image(img)
    assert back.enable_ir and not back.remote_wakeup and not back.have_serial


def test_bad_header_rejected():
    img = bytearray(eeprom.generate_image(eeprom.DEFAULT_CONFIGS["realtek"]))
    img[0] = 0xFF
    with pytest.raises(eeprom.EepromError, match="header"):
        eeprom.parse_image(bytes(img))


def test_string_overflow_rejected():
    # All three descriptors must fit below byte 78 (rtl_eeprom.c:117);
    # unlike the reference (silent truncation) we raise.
    conf = dataclasses.replace(
        eeprom.DEFAULT_CONFIGS["realtek"], product="X" * 40)
    with pytest.raises(eeprom.EepromError, match="too long"):
        eeprom.generate_image(conf)


def test_cli_generate_edit_read(tmp_path, capsys):
    out = tmp_path / "eeprom.bin"
    rc = eeprom.main(["--generate", "noxon", "--serial", "CAFE01",
                      "--ir", "1", "--out", str(out)])
    assert rc == 0
    conf = eeprom.parse_image(out.read_bytes())
    assert conf.vendor_id == 0x0CCD and conf.product_id == 0x00B3
    assert conf.serial == "CAFE01" and conf.enable_ir

    rc = eeprom.main(["--read", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert "0x0ccd" in text and "CAFE01" in text
