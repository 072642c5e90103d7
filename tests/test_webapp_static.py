"""Static consistency checks of the dashboard's JS against its own HTML
and the webapp's routes.

There is no browser or JS runtime in this image (documented scoping —
docs/PARITY.md), so the UI cannot be executed in CI. These checks catch
the classic silent breakages DOM-substring tests miss: a renamed element
id, an onclick pointing at a deleted function, or the JS polling an API
path the proxy no longer serves.
"""

import re
from pathlib import Path

HTML = (
    Path(__file__).resolve().parents[1]
    / "radio_mapper_tpu/webapp/static/index.html"
).read_text()


def _script() -> str:
    return "\n".join(re.findall(r"<script[^>]*>(.*?)</script>", HTML, re.S))


def test_every_getelementbyid_target_exists():
    js = _script()
    ids_used = set(re.findall(r"getElementById\(\s*['\"]([\w-]+)['\"]", js))
    ids_defined = set(re.findall(r"id=\"([\w-]+)\"", HTML))
    # ids built dynamically (template literals) are exempt by construction
    missing = {i for i in ids_used if i not in ids_defined}
    assert not missing, f"JS references undefined element ids: {sorted(missing)}"


def test_every_onclick_handler_is_defined():
    js = _script()
    handlers = set(re.findall(r"onclick=\"(\w+)\(", HTML))
    defined = set(re.findall(r"function\s+(\w+)\s*\(", js))
    defined |= set(re.findall(r"(?:const|let|var)\s+(\w+)\s*=\s*(?:async\s*)?\(", js))
    missing = handlers - defined - {"if"}  # inline `if(...)` guards
    assert not missing, f"onclick references undefined functions: {sorted(missing)}"


def test_polled_api_paths_are_served():
    """Every /api path the dashboard fetches must exist in the webapp."""
    import inspect

    from radio_mapper_tpu.webapp import app as webapp_app

    js = _script()
    paths = set(re.findall(r"['\"](/api/[\w-]+)", js))
    assert paths, "expected the dashboard to poll /api endpoints"
    src = inspect.getsource(webapp_app)
    missing = {p for p in paths if p not in src}
    assert not missing, f"dashboard polls unserved paths: {sorted(missing)}"


def test_ellipse_fields_flow_to_ui():
    """The error-ellipse API fields are actually consumed by the map JS."""
    js = _script()
    for field in ("ellipse_major_m", "ellipse_minor_m", "ellipse_orientation_deg"):
        assert field in js, field


# ---------------------------------------------------------------- contract
# The r4 split (VERDICT r3 item 8): static/app.js is a PURE data→fragment
# layer whose functions take API objects under fixed parameter names.
# These tests extract every field each pure function reads and check it
# against the JSON the REAL central handlers serve (state injected
# in-process) — both directions, so either side drifting fails CI.

import asyncio
import json as _json
from datetime import datetime, timezone

APP_JS = (
    Path(__file__).resolve().parents[1]
    / "radio_mapper_tpu/webapp/static/app.js"
).read_text()


def _fn_body(name: str) -> str:
    m = re.search(rf"function {name}\(.*?\n}}", APP_JS, re.S)
    assert m, f"pure function {name} missing from app.js"
    return m.group(0)


def _reads(param: str, *fn_names: str) -> set:
    out = set()
    for fn in fn_names:
        out |= set(re.findall(rf"\b{param}\.(\w+)", _fn_body(fn)))
    # method calls on values (e.g. s.lat.toFixed) are field reads too;
    # strip JS builtins that slip in via chaining
    return out - {"toFixed", "join", "toUpperCase", "filter", "length"}


def _served_payloads():
    """Real handler JSON with synthetic state — the wire truth."""
    from radio_mapper_tpu.runtime.central import CentralProcessor, NodeConnection
    from radio_mapper_tpu.runtime.datamodel import (
        LiveSignalDetection, TriangulatedSignal,
    )

    cp = CentralProcessor()
    now = datetime.now(timezone.utc)
    cp.nodes["b1"] = NodeConnection(
        node_id="b1", websocket=None, last_seen=now, position=(35.0, -97.0),
        latest_signal_timestamp=now,
    )
    cp.signal_buffer.append(LiveSignalDetection(
        node_id="b1", frequency_mhz=121.5, signal_strength_dbm=-40.0,
        timestamp_utc=now.isoformat(), gps_timestamp_ns=1, lat=35.0,
        lng=-97.0, confidence=0.9, signal_type="emergency",
    ))
    cp.triangulated_signals.append(TriangulatedSignal(
        signal_id="SIG_1", frequency_mhz=121.5, estimated_lat=35.1,
        estimated_lng=-97.1, confidence=0.8, detected_by=["b1", "b2", "b3"],
        detection_timestamps=[now.isoformat()], signal_type="emergency",
        triangulation_method="gcc-phat+lm", accuracy_meters=120.0,
        ellipse_major_m=150.0, ellipse_minor_m=80.0,
        ellipse_orientation_deg=45.0,
    ))

    async def grab():
        return {
            "nodes": _json.loads((await cp.api_nodes(None)).text),
            "signals": _json.loads((await cp.api_signals(None)).text),
            "detections": _json.loads((await cp.api_detections(None)).text),
            "status": _json.loads((await cp.api_system_status(None)).text),
        }

    return asyncio.run(grab())


def test_contract_js_reads_are_served():
    """Direction 1: every field the pure layer reads must exist in the
    corresponding served payload (modulo the documented optional set)."""
    served = _served_payloads()
    # the webapp's --mock mode adds these; the JS reads them defensively
    optional = {"status": {"mock", "development_mode"}}
    cases = {
        "nodes": _reads("n", "buoyPopupHtml") | _reads("b", "buoyTableRowHtml"),
        "detections": _reads(
            "d", "detectionPasses", "detectionPopupHtml",
            "detectionRowHtml", "detectionTableRowHtml",
        ),
        "signals": _reads("s", "signalPasses", "signalPopupHtml", "signalRowHtml")
        | _reads("s", "emergencyBannerText")
        | _reads("e", "emergencyBannerText"),
        "status": _reads("status", "statusModel"),
    }
    for api, fields in cases.items():
        assert fields, f"no reads extracted for {api} — regex drifted?"
        payload = served[api]
        record = payload[0] if isinstance(payload, list) else payload
        missing = fields - set(record) - optional.get(api, set())
        assert not missing, f"JS reads fields {sorted(missing)} absent from /api/{api}"
    # nested status read
    assert "triangulation_ready" in served["status"]["network"]


def test_contract_served_fields_are_read_or_documented():
    """Direction 2: every field the server emits is either consumed by
    the dashboard (pure layer or wiring) or on the explicit
    intentionally-unused list — so silent server-side drift fails too."""
    served = _served_payloads()
    js_all = APP_JS + _script()
    unused_ok = {
        "nodes": set(),
        # id/timestamps ride for API consumers; strength placeholder is
        # reference parity (`central_processor.py:132-151`)
        "signals": {"id", "signal_strength", "timestamp", "triangulated"},
        "detections": {"id", "triangulated"},
        "status": {
            "uptime_seconds", "connected_nodes", "buffered_detections",
            "triangulated_signals", "server_time",
        },
    }
    for api, allow in unused_ok.items():
        payload = served[api]
        record = payload[0] if isinstance(payload, list) else payload
        unread = {
            k for k in record
            if k not in allow and not re.search(rf"\b\w\.{k}\b|\bstatus\.{k}\b", js_all)
        }
        assert not unread, (
            f"/api/{api} serves fields the dashboard never reads and that "
            f"are not on the documented-unused list: {sorted(unread)}"
        )


def test_pure_layer_functions_exist_and_are_pure():
    """The wiring/pure split contract: app.js must not touch the DOM,
    fetch, Leaflet or the wall clock — those belong to index.html."""
    for banned in ("document.", "fetch(", "L.", "Date.now", "setInterval"):
        assert banned not in APP_JS, f"app.js must stay pure (found {banned!r})"
    # and the wiring must actually use the pure layer (timeAgo is an
    # internal helper consumed by the other pure functions)
    assert "function timeAgo(" in APP_JS
    wiring = _script()
    for fn in (
        "detectionPasses", "signalPasses", "ellipsePoints",
        "buoyPopupHtml", "detectionPopupHtml", "signalPopupHtml",
        "signalRowHtml", "detectionRowHtml", "detectionTableRowHtml",
        "buoyTableRowHtml", "emergencyBannerText", "statusModel",
        "searchResultText",
    ):
        # called directly or passed by reference (renderList callbacks)
        assert re.search(rf"\b{fn}\b", wiring), f"wiring never uses {fn}"
        assert f"function {fn}(" in APP_JS, f"{fn} missing from app.js"
