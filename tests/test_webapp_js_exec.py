"""EXECUTE the dashboard's pure JS layer (VERDICT r4 item 6).

The image has no JS engine, so `tools/jsmini.py` (a minimal
ECMAScript-subset interpreter) runs every exported app.js function
against the same injected-state JSON the contract tests use
(test_webapp_static._served_payloads — real central handlers, synthetic
state) and asserts the actual rendered fragments. A rendering regression
(wrong field, broken template literal, bad arithmetic) now fails CI even
though it would pass the structural contract checks.
"""

import math
import re
from pathlib import Path

import pytest

from tools.jsmini import Interp, UNDEFINED, JSError

import test_webapp_static as contract

APP_JS_PATH = (
    Path(__file__).resolve().parents[1]
    / "radio_mapper_tpu/webapp/static/app.js"
)

NOW_MS = 1_767_225_600_000.0  # 2026-01-01T00:00:00Z


@pytest.fixture(scope="module")
def js():
    return Interp(APP_JS_PATH.read_text())


@pytest.fixture(scope="module")
def served():
    return contract._served_payloads()


def test_interpreter_covers_every_app_js_function(js):
    """jsmini must load (parse + close over) every function app.js
    exports — unknown syntax raises at construction, so passing here
    means the whole file is inside the supported subset."""
    declared = set(
        re.findall(r"^function\s+(\w+)\s*\(", APP_JS_PATH.read_text(), re.M)
    )
    assert declared == set(js.functions), (declared, set(js.functions))


def test_time_ago_buckets(js):
    iso = "2025-12-31T23:59:30+00:00"  # 30 s before NOW_MS
    assert js.call("timeAgo", iso, NOW_MS) == "30s ago"
    assert js.call("timeAgo", "2025-12-31T23:30:00+00:00", NOW_MS) == "30m ago"
    assert js.call("timeAgo", "2025-12-31T12:00:00+00:00", NOW_MS) == "12h ago"
    assert js.call("timeAgo", "", NOW_MS) == "n/a"
    assert js.call("timeAgo", "not-a-date", NOW_MS) == "n/a"
    just = "2025-12-31T23:59:59+00:00"
    assert js.call("timeAgo", just, NOW_MS) == "just now"
    # >24 h falls back to a locale date string
    assert "/" in js.call("timeAgo", "2025-01-15T00:00:00+00:00", NOW_MS)


def test_filters_execute_on_served_records(js, served):
    d = dict(served["detections"][0])
    assert js.call("detectionPasses", d, {"min": 0.0, "max": 1e9, "type": "all"})
    assert not js.call(
        "detectionPasses", d, {"min": 0.0, "max": 1e9, "type": "fm"}
    )  # fixture is emergency
    assert not js.call("detectionPasses", d, {"min": 0.0, "max": 1.0, "type": "all"})
    s = dict(served["signals"][0])
    assert js.call("signalPasses", s, {"min": 0.0, "max": 1e9, "type": "all"})
    assert js.call(
        "signalPasses", s, {"min": 0.0, "max": 1e9, "type": "emergency"}
    )
    assert not js.call("signalPasses", s, {"min": 200.0, "max": 400.0, "type": "all"})


def test_ellipse_points_geometry(js):
    pts = js.call("ellipsePoints", 35.0, -97.0, 300.0, 100.0, 90.0)
    assert len(pts) == 37
    # ring closes
    assert pts[0][0] == pytest.approx(pts[-1][0])
    assert pts[0][1] == pytest.approx(pts[-1][1])
    # bearing 90° ⇒ major axis along EAST: lng excursion ≫ lat excursion
    lat_span = max(p[0] for p in pts) - min(p[0] for p in pts)
    lng_span = max(p[1] for p in pts) - min(p[1] for p in pts)
    m_per_deg_lat = 111320.0
    m_per_deg_lng = 111320.0 * math.cos(math.radians(35.0))
    assert lat_span * m_per_deg_lat == pytest.approx(200.0, rel=0.05)  # minor ×2
    assert lng_span * m_per_deg_lng == pytest.approx(600.0, rel=0.05)  # major ×2
    # degenerate ellipse → null
    assert js.call("ellipsePoints", 35.0, -97.0, 0.0, 0.0, 0.0) is None


def test_popup_and_row_fragments_render_served_state(js, served):
    n = dict(served["nodes"][0])
    html = js.call("buoyPopupHtml", n, NOW_MS)
    assert f"<b>{n['name']}</b>" in html and n["status"] in html

    d = dict(served["detections"][0])
    html = js.call("detectionPopupHtml", d, NOW_MS)
    assert "121.5 MHz" in html and "-40 dBm" in html and d["node_id"] in html

    s = dict(served["signals"][0])
    html = js.call("signalPopupHtml", s)
    assert "121.5 MHz" in html
    assert "±120 m" in html
    assert "1σ ellipse 150×80 m @ 45°" in html
    assert "conf 0.80" in html
    assert "b1, b2, b3" in html

    row = js.call("signalRowHtml", s)
    assert "35.10000, -97.10000" in row and "emergency" in row

    row = js.call("detectionRowHtml", d, NOW_MS)
    assert "121.5 MHz" in row and "conf 0.9" in row

    tr = js.call("detectionTableRowHtml", d, NOW_MS)
    assert "<td>121.500 MHz</td>" in tr
    assert "<td>-40.0 dBm</td>" in tr
    assert '<span class="tag emergency">emergency</span>' in tr
    assert "<td>0.90</td>" in tr

    b = dict(served["nodes"][0])
    tr = js.call("buoyTableRowHtml", b, NOW_MS)
    assert "35.0000, -97.0000" in tr
    assert (b.get("id") or b["name"]) in tr


def test_emergency_banner_and_status_model(js, served):
    sig = dict(served["signals"][0])
    txt = js.call("emergencyBannerText", [sig])
    assert txt.startswith("⚠ EMERGENCY SIGNAL: 121.5 MHz at 35.10000, -97.10000")
    assert "±120 m" in txt
    assert js.call("emergencyBannerText", []) is None
    calm = dict(sig, signal_type="fm")
    assert js.call("emergencyBannerText", [calm]) is None

    st = js.call("statusModel", dict(served["status"]))
    assert st["ready"] in ("YES", "NO")
    assert st["dev"] is False
    assert js.call("statusModel", {"mock": True})["dev"] is True
    assert (
        js.call("statusModel", {"network": {"triangulation_ready": True}})["ready"]
        == "YES"
    )


def test_search_result_text(js):
    res = {"count": 2.0, "matches": [{"lat": 35.12345, "lng": -97.54321}]}
    out = js.call("searchResultText", res)
    assert out == "2 match(es) — strongest at 35.12345, -97.54321"
    assert js.call("searchResultText", {"count": 0.0, "matches": []}) == "0 match(es)"


def test_undefined_fields_render_js_style(js):
    """Defensive paths: records with absent optional fields must render
    the way a browser would (undefined/NaN semantics), not crash."""
    html = js.call(
        "signalPopupHtml",
        {
            "signal_type": "fm", "frequency": 100.1, "accuracy_meters": 50.0,
            "confidence": 0.5, "ellipse_major_m": 0.0, "ellipse_minor_m": 0.0,
            "ellipse_orientation_deg": 0.0,
        },
    )
    assert "fm" in html and "by " in html  # detected_by falls back to []
    assert "1σ ellipse" not in html  # zero ellipse suppressed
    with pytest.raises(JSError):
        js.call("no_such_function")
