"""Vector geometry queries (ST_* registry + layer algebra) — SURVEY §2.7-2.8.

Filled in as the geometry function registry lands.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict[str, str] = {}
