"""Typed describe-output models — mirrors /root/reference/rio_cogeo/models.py:18-85.

Plain dataclasses (pydantic-free so the container's baked deps suffice);
``.dict()`` gives the same JSON shape the reference's pydantic models emit.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass
class BoundingBox:
    """(west, south, east, north) — reference models.py:10-15 (rasterio coords)."""

    west: float
    south: float
    east: float
    north: float


@dataclass
class IFD:
    """Per-level metadata record — reference models.py:18-25."""

    Level: int
    Width: int
    Height: int
    Blocksize: Tuple[int, int]
    Decimation: int


@dataclass
class Geo:
    """Geographic info — reference models.py:28-37."""

    CRS: str
    BoundingBox: Tuple[float, float, float, float]
    Origin: Tuple[float, float]
    Resolution: Tuple[float, float]
    MinZoom: Optional[int] = None
    MaxZoom: Optional[int] = None


@dataclass
class Profile:
    """Structural profile — reference models.py:40-56."""

    Bands: int
    Width: int
    Height: int
    Tiled: bool
    Dtype: str
    Interleave: str
    AlphaBand: bool
    InternalMask: bool
    Nodata: Optional[float] = None
    ColorInterp: Tuple[str, ...] = ()
    ColorMap: bool = False
    Scales: Tuple[float, ...] = ()
    Offsets: Tuple[float, ...] = ()


@dataclass
class BandMetadata:
    """Per-band metadata — reference models.py:59-66."""

    Description: Optional[str] = None
    ColorInterp: str = "gray"
    Offset: float = 0.0
    Scale: float = 1.0
    Metadata: Dict[str, str] = field(default_factory=dict)


@dataclass
class Info:
    """cog_info output — reference models.py:69-85."""

    Path: str
    Driver: str
    COG: bool
    Compression: Optional[str]
    ColorSpace: Optional[str]
    COG_errors: Optional[List[str]]
    COG_warnings: Optional[List[str]]
    Profile: Profile
    GEO: Geo
    Tags: Dict[str, Dict[str, str]] = field(default_factory=dict)
    Band_Metadata: Dict[str, BandMetadata] = field(default_factory=dict)
    IFD: List[IFD] = field(default_factory=list)

    def dict(self) -> dict:
        return asdict(self)
