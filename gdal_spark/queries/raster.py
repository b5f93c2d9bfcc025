"""Raster queries (translate/warp/tile/zonal) — SURVEY §2.9-2.10.

Filled in as the raster block engine lands.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict[str, str] = {}
