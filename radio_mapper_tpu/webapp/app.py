"""Web dashboard server.

Capability parity with the reference webapp (`webapp/app.py`): serves the
Leaflet map UI and proxies the central processor's HTTP API so the browser
only talks to one origin (`webapp/app.py:28-37, 182-433`), with a cached
system-status endpoint. Uses aiohttp (flask is not in this image).

Routes:
  /                     — dashboard (Leaflet map, 5 s polling)
  /api/nodes|signals|detections|search_signal|system-status — proxied
  /api/local-status     — webapp-side status (GPS device probe, uptime)
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional

import aiohttp
from aiohttp import web

from radio_mapper_tpu.config.autodetect import detect_gps_devices
from radio_mapper_tpu.runtime.gps import read_serial_fix

logger = logging.getLogger(__name__)

STATIC_DIR = os.path.join(os.path.dirname(__file__), "static")


class WebApp:
    def __init__(
        self,
        central_http_url: str = "http://localhost:4000",
        *,
        host: str = "0.0.0.0",
        port: int = 7000,
        hardware_cache_s: float = 10.0,
    ):
        self.central_http_url = central_http_url.rstrip("/")
        self.host = host
        self.port = port
        self.hardware_cache_s = hardware_cache_s
        self._hw_cache = (0.0, None)
        self.started_at = time.time()
        self._runner: Optional[web.AppRunner] = None

    async def _proxy(self, request: web.Request, path: str) -> web.Response:
        url = f"{self.central_http_url}{path}"
        try:
            async with aiohttp.ClientSession() as session:
                if request.method == "POST":
                    body = await request.read()
                    async with session.post(
                        url, data=body, headers={"Content-Type": "application/json"},
                        timeout=aiohttp.ClientTimeout(total=10),
                    ) as resp:
                        text = await resp.text()
                        return web.Response(
                            text=text, status=resp.status, content_type="application/json"
                        )
                async with session.get(
                    url, timeout=aiohttp.ClientTimeout(total=10)
                ) as resp:
                    text = await resp.text()
                    return web.Response(
                        text=text, status=resp.status, content_type="application/json"
                    )
        except (aiohttp.ClientError, TimeoutError, OSError) as e:
            logger.warning("central proxy failed for %s: %s", path, e)
            return web.Response(
                text=json.dumps({"error": f"central unavailable: {e}"}),
                status=502,
                content_type="application/json",
            )

    async def index(self, request) -> web.Response:
        with open(os.path.join(STATIC_DIR, "index.html")) as f:
            return web.Response(text=f.read(), content_type="text/html")

    async def local_status(self, request) -> web.Response:
        """Webapp-host hardware status with a 10 s cache
        (`webapp/app.py:40-57` pattern)."""
        now = time.time()
        ts, cached = self._hw_cache
        if cached is None or now - ts > self.hardware_cache_s:
            devices = detect_gps_devices()
            fix = None
            for dev in devices[:2]:
                fix = read_serial_fix(dev, timeout_s=0.5)
                if fix:
                    break
            cached = {
                "gps_devices": devices,
                "gps_fix": {
                    "lat": fix.lat, "lng": fix.lng, "satellites": fix.num_satellites
                } if fix else None,
                "uptime_seconds": now - self.started_at,
            }
            self._hw_cache = (now, cached)
        return web.Response(text=json.dumps(cached), content_type="application/json")

    def build_app(self) -> web.Application:
        app = web.Application()
        app.router.add_get("/", self.index)
        app.router.add_get("/api/local-status", self.local_status)
        def proxy_route(path):
            async def handler(request):
                return await self._proxy(request, path)

            return handler

        for path in ("/api/nodes", "/api/signals", "/api/detections", "/api/system-status"):
            app.router.add_get(path, proxy_route(path))
        app.router.add_post("/api/search_signal", proxy_route("/api/search_signal"))
        return app

    async def start(self):
        self._runner = web.AppRunner(self.build_app())
        await self._runner.setup()
        site = web.TCPSite(self._runner, self.host, self.port)
        await site.start()
        logger.info("webapp on http://%s:%d (central: %s)", self.host, self.port, self.central_http_url)

    async def stop(self):
        if self._runner:
            await self._runner.cleanup()

    async def run_forever(self):
        import asyncio

        await self.start()
        try:
            await asyncio.Future()
        finally:
            await self.stop()
