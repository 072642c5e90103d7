"""Physical constants, frequency band tables and scan schedule defaults.

Behavioral parity sources (values, not code) in ``/root/reference``:
``tdoa_processor.py:141`` (speed of light), ``tdoa_processor.py:73``
(spherical Earth radius), ``buoy_node.py:342-355`` (band classifier),
``config.yaml:74-131`` (emergency/testing frequencies and the 35 s
synchronized scan schedule), ``buoy_node.py:141`` (detection threshold).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# --- Physics ---------------------------------------------------------------
SPEED_OF_LIGHT_M_S = 299_792_458.0

# Reference uses a spherical Earth with the WGS84 equatorial radius
# (`tdoa_processor.py:73`). We keep that model for parity and additionally
# provide a proper WGS84 ellipsoid in :mod:`radio_mapper_tpu.geo`.
EARTH_RADIUS_M = 6_378_137.0
WGS84_A = 6_378_137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)

# --- RTL-SDR envelope (`Code/include/rtl-sdr.h:252-254`) -------------------
SDR_MIN_SAMPLE_RATE_HZ = 225_000
SDR_MAX_SAMPLE_RATE_HZ = 3_200_000
SDR_LOSSLESS_MAX_RATE_HZ = 2_400_000
DEFAULT_SAMPLE_RATE_HZ = 2_048_000  # `config.yaml:24`

# --- Detection defaults (`buoy_node.py:141, 364, 423, 427-433`) ------------
DEFAULT_DETECTION_THRESHOLD_DBM = -70.0
DEFAULT_CONFIDENCE_FLOOR = 0.3
DEFAULT_SNR_FULLSCALE_DB = 20.0  # confidence = SNR / 20, clipped to [0, 1]
DEFAULT_DC_NOTCH_HZ = 10_000.0  # skip ±10 kHz around the tuned center
DEFAULT_PEAK_MIN_DISTANCE_BINS = 10
DEFAULT_BLOCK_SAMPLES = 16_384
STREAM_BLOCK_SAMPLES = 8_192  # `iq_stream_client.py:459`

# --- Emergency / testing frequencies (MHz) (`config.yaml:74-89`) -----------
EMERGENCY_FREQUENCIES_MHZ: Tuple[float, ...] = (121.5, 243.0, 406.025, 156.8, 462.675)
TESTING_FREQUENCIES_MHZ: Tuple[float, ...] = (105.7, 101.9)

# Frequency ranges to scan, MHz (`config.yaml:91-97`).
SCAN_RANGES_MHZ = {
    "aviation": (118.0, 136.0),
    "public_safety": (155.0, 160.0),
    "amateur_2m": (144.0, 148.0),
    "amateur_70cm": (420.0, 450.0),
    "fm_broadcast": (88.0, 108.0),
}

# --- TDOA defaults (`config.yaml:141-150`, `tdoa_processor.py:340,406`) ----
DEFAULT_MIN_BUOYS = 3
DEFAULT_MAX_BASELINE_KM = 50.0
DEFAULT_FREQ_TOLERANCE_MHZ = 0.01
DEFAULT_CORRELATION_WINDOW_S = 10.0
CENTRAL_CORRELATION_WINDOW_S = 5.0  # `central_processor.py:85`


@dataclasses.dataclass(frozen=True)
class ScheduleEntry:
    """One dwell in the GPS-synchronized frequency scan schedule."""

    frequency_mhz: float
    duration_s: float
    signal_type: str


# 35-second synchronized cycle (`buoy_node.py:146-153`, `config.yaml:113-131`).
DEFAULT_SCAN_SCHEDULE: Tuple[ScheduleEntry, ...] = (
    ScheduleEntry(105.7, 5.0, "testing"),
    ScheduleEntry(121.5, 10.0, "emergency"),
    ScheduleEntry(243.0, 10.0, "emergency"),
    ScheduleEntry(156.8, 5.0, "emergency"),
    ScheduleEntry(101.9, 5.0, "testing"),
)


def schedule_cycle_s(schedule: Tuple[ScheduleEntry, ...] = DEFAULT_SCAN_SCHEDULE) -> float:
    return float(sum(e.duration_s for e in schedule))


def frequency_at(t_unix_s: float, schedule: Tuple[ScheduleEntry, ...] = DEFAULT_SCAN_SCHEDULE) -> ScheduleEntry:
    """Dwell active at wall-clock time ``t`` — all nodes tune identically.

    Mirrors the reference's GPS-synchronized scheduler, which indexes the
    schedule by ``int(time) % cycle`` (`buoy_node.py:226-242`).
    """
    cycle = schedule_cycle_s(schedule)
    pos = int(t_unix_s) % int(cycle)
    elapsed = 0.0
    for entry in schedule:
        if elapsed <= pos < elapsed + entry.duration_s:
            return entry
        elapsed += entry.duration_s
    return schedule[0]


def classify_frequency_mhz(frequency_mhz: float) -> str:
    """Band classification used to tag detections (`buoy_node.py:342-355`)."""
    if frequency_mhz in (121.5, 243.0):
        return "emergency"
    if 118.0 <= frequency_mhz <= 136.0:
        return "aviation"
    if 144.0 <= frequency_mhz <= 148.0:
        return "amateur"
    if 156.0 <= frequency_mhz <= 162.0:
        return "marine"
    if 406.0 <= frequency_mhz <= 406.1:
        return "emergency_beacon"
    return "unknown"


def classification_label(frequency_mhz: float, signal_type: str) -> str:
    """Human-readable label for the API layer (`central_processor.py:237-255`)."""
    if signal_type == "emergency":
        if abs(frequency_mhz - 121.5) < 0.001:
            return "Aviation Emergency - 121.5 MHz"
        if abs(frequency_mhz - 243.0) < 0.001:
            return "Military Emergency - 243.0 MHz"
        return "Emergency Frequency"
    labels = {
        "public_safety": "Public Safety Radio",
        "aviation": "Aviation Communication",
        "amateur": "Amateur Radio",
        "fm_radio": "FM Radio Broadcast",
    }
    return labels.get(signal_type, f"{signal_type.title()} Signal")
