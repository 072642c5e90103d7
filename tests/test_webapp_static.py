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
