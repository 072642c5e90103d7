"""Wire/data model shared by nodes, the central service and the web API.

Field-for-field parity with the reference dataclasses so existing clients
of its JSON APIs keep working: `SignalDetection`/`BuoyPosition`/
`TDoAMeasurement`/`TriangulationResult` (`tdoa_processor.py:24-69`),
`LiveSignalDetection`/`TriangulatedSignal` (`central_processor.py:40-68`),
`BuoyStatus` (`buoy_node.py:49-61`), `UserSignalRequest`
(`iq_stream_client.py:62-70`).
"""

from __future__ import annotations

import dataclasses
import json
from datetime import datetime, timezone
from typing import Any, Dict, List, Optional

import numpy as np


def utc_now_iso() -> str:
    return datetime.now(timezone.utc).isoformat()


def parse_iso(ts: str) -> datetime:
    """Tolerant ISO parse (accepts trailing 'Z', `central_processor.py:160`)."""
    return datetime.fromisoformat(ts.replace("Z", "+00:00"))


class NumpyJSONEncoder(json.JSONEncoder):
    """JSON encoder for numpy scalars/arrays and complex IQ snippets
    (parity: `iq_stream_client.py:33-44`)."""

    def default(self, obj):
        if isinstance(obj, (np.integer,)):
            return int(obj)
        if isinstance(obj, (np.floating,)):
            return float(obj)
        if isinstance(obj, np.ndarray):
            if np.iscomplexobj(obj):
                return [[float(v.real), float(v.imag)] for v in obj]
            return obj.tolist()
        if isinstance(obj, (complex, np.complexfloating)):
            return [float(obj.real), float(obj.imag)]
        if isinstance(obj, datetime):
            return obj.isoformat()
        return super().default(obj)


def to_json(obj: Any) -> str:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        obj = dataclasses.asdict(obj)
    return json.dumps(obj, cls=NumpyJSONEncoder)


@dataclasses.dataclass
class BuoyPosition:
    buoy_id: str
    lat: float
    lng: float
    altitude: float = 0.0
    timing_accuracy_ns: int = 100_000


@dataclasses.dataclass
class SignalDetection:
    """One detection event from one buoy (`tdoa_processor.py:33-45`).

    The three ``iq_*`` fields carry the waveform snippet that enables
    waveform-level GCC-PHAT TDOA — the capability the reference documents
    as the fix for its timestamp-mode accuracy collapse
    (`Documents/TDOA_README.md:66-67`) and extracts snippets for
    (`iq_stream_client.py:306-315`) but never correlates:
      iq_samples         — complex baseband snippet around the detection;
      iq_sample_rate_hz  — snippet sample rate (0 ⇒ no snippet);
      iq_anchor_ns       — GPS timestamp of the snippet's first sample,
                           used only for coarse same-dwell gating (the
                           fine τ comes from the waveforms themselves).
    """

    buoy_id: str
    frequency_mhz: float
    signal_strength_dbm: float
    timestamp_utc: str
    gps_timestamp_ns: int
    lat: float
    lng: float
    confidence: float
    signal_type: str = "unknown"
    iq_samples: Optional[Any] = None  # ndarray or list of complex
    iq_sample_rate_hz: float = 0.0
    iq_anchor_ns: int = 0


@dataclasses.dataclass
class LiveSignalDetection:
    """Central-side detection record (`central_processor.py:40-54`)."""

    node_id: str
    frequency_mhz: float
    signal_strength_dbm: float
    timestamp_utc: str
    gps_timestamp_ns: int
    lat: float
    lng: float
    confidence: float
    signal_type: str
    bandwidth_hz: float = 10_000.0
    detection_method: str = "unknown"
    iq_samples: Optional[List[complex]] = None
    iq_sample_rate_hz: float = 0.0
    iq_anchor_ns: int = 0

    @classmethod
    def from_message(cls, data: Dict) -> "LiveSignalDetection":
        """Build from a wire dict, tolerating buoy-style field names
        (`central_processor.py:307-325`)."""
        d = dict(data)
        if "buoy_id" in d:
            d["node_id"] = d.pop("buoy_id")
        d.setdefault("bandwidth_hz", 10_000.0)
        for unwanted in ("iq_sample_file", "correlation_id"):
            d.pop(unwanted, None)
        if d.get("iq_samples"):
            d["iq_samples"] = [
                complex(v[0], v[1]) if isinstance(v, (list, tuple)) else complex(v)
                for v in d["iq_samples"]
            ]
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclasses.dataclass
class TDoAMeasurement:
    buoy1_id: str
    buoy2_id: str
    time_difference_ns: int  # buoy2 − buoy1; positive ⇒ buoy2 later
    distance_difference_m: float
    confidence: float
    frequency_mhz: float


@dataclasses.dataclass
class TriangulationResult:
    estimated_lat: float
    estimated_lng: float
    estimated_altitude: float
    accuracy_meters: float
    confidence: float
    frequency_mhz: float
    signal_type: str
    timestamp_utc: str
    contributing_buoys: List[str]
    tdoa_measurements: List[TDoAMeasurement]
    method: str  # "hyperbolic-lm", "gcc-phat+lm", ...
    # 1σ horizontal error ellipse from the solver's CRLB covariance
    # (solver.SolveResult) — an extension over the reference's single
    # residual-RMS scalar (`tdoa_processor.py:299`). Orientation is the
    # major-axis bearing, degrees clockwise from North, in [0, 180).
    ellipse_major_m: float = 0.0
    ellipse_minor_m: float = 0.0
    ellipse_orientation_deg: float = 0.0


@dataclasses.dataclass
class TriangulatedSignal:
    """API-facing triangulated signal record (`central_processor.py:56-68`)."""

    signal_id: str
    frequency_mhz: float
    estimated_lat: float
    estimated_lng: float
    confidence: float
    detected_by: List[str]
    detection_timestamps: List[str]
    signal_type: str
    triangulation_method: str
    accuracy_meters: float
    # 1σ horizontal error ellipse (see TriangulationResult)
    ellipse_major_m: float = 0.0
    ellipse_minor_m: float = 0.0
    ellipse_orientation_deg: float = 0.0


@dataclasses.dataclass
class BuoyStatus:
    """Heartbeat payload (`buoy_node.py:49-61`)."""

    buoy_id: str
    lat: float
    lng: float
    gps_locked: bool
    timing_accuracy_ns: int
    sdr_active: bool
    last_detection: Optional[str]
    uptime_seconds: float
    signals_detected: int


@dataclasses.dataclass
class UserSignalRequest:
    """Frequency-search request (`iq_stream_client.py:62-70`)."""

    request_id: str
    frequency_mhz: float
    bandwidth_khz: float = 12.5
    duration_seconds: float = 30.0
    priority: str = "normal"
    timestamp_utc: str = ""
