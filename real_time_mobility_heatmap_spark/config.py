"""Engine configuration.

Mirrors the reference's environment-bound constants (heatmap_stream.py:23-37:
CITY, H3_RES, TILE_MINUTES, TTL_MINUTES, watermark) as an explicit dataclass
so every operator is parameterized instead of reading globals.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    """Parameters of the mobility pipeline.

    Defaults match the reference: 5-minute tumbling tiles
    (heatmap_stream.py:29), 10-minute watermark (heatmap_stream.py:107),
    45-minute TTL (heatmap_stream.py:30), grid resolution analogous to
    H3_RES=8 (heatmap_stream.py:26) but expressed as a uniform lat/lon grid
    scale so the snap is pure column math (SQL-expressible in any engine;
    see functions/grid.py for the real-H3 plug-in).
    """

    city: str = os.getenv("CITY", "boston")
    grid_scale: int = 20          # cells of 1/20 degree; analog of H3_RES
    tile_minutes: int = 5         # tumbling window width
    ttl_minutes: int = 45         # tile retention after window end
    watermark: str = "10 minutes"  # late-data bound for streaming aggs

    @property
    def grid_name(self) -> str:
        # analog of the reference's grid id "h3r{H3_RES}" (heatmap_stream.py:179)
        return f"grid{self.grid_scale}"

    @property
    def window_duration(self) -> str:
        return f"{self.tile_minutes} minutes"


DEFAULT = EngineConfig()
