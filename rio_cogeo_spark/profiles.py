"""Engine output profiles — the analog of COG creation profiles.

Mirrors /root/reference/rio_cogeo/profiles.py:154-190: a registry of named
profiles, each a plain dict of write options; ``get`` raises ``KeyError``
on unknown names and returns a *copy* (reference tests/test_profile.py:118-123).

In a Spark/Iceberg world a "profile" maps to table write properties:
parquet codec ↔ TIFF compression, target block rows ↔ 512x512 internal
tile, write order ↔ COG block layout.
"""

from __future__ import annotations

from typing import Any, Dict


class CogSparkProfile(dict):
    """One output profile. Keys follow the reference's creation-option
    shape (profiles.py:10-18) re-expressed for parquet tables."""

    def __init__(self, data: Dict[str, Any] | None = None, **kwargs: Any):
        base = {
            "format": "parquet",
            "blockxsize": 512,
            "blockysize": 512,
            "interleave": "pixel",
            "tiled": True,
            "compression": "zstd",
            # Iceberg-style knobs (applied when an Iceberg catalog exists)
            "write.target-file-size-bytes": 512 * 1024 * 1024,
        }
        base.update(data or {})
        base.update(kwargs)
        super().__init__(base)


# Same profile names as the reference registry (profiles.py:154-187).
# Lossy pixel codecs (jpeg/webp/lerc) have no parquet analog: they keep the
# name, carry ``lossy=True`` and downgrade to zstd with a note.
_PROFILES: Dict[str, CogSparkProfile] = {
    "jpeg": CogSparkProfile(compression="zstd", lossy=True, quality=85),
    "webp": CogSparkProfile(compression="zstd", lossy=True),
    "zstd": CogSparkProfile(compression="zstd"),
    "lzw": CogSparkProfile(compression="lz4"),
    "deflate": CogSparkProfile(compression="gzip"),
    "packbits": CogSparkProfile(compression="snappy"),
    "lzma": CogSparkProfile(compression="gzip"),
    "lerc": CogSparkProfile(compression="zstd", lossy=True),
    "lerc_deflate": CogSparkProfile(compression="gzip", lossy=True),
    "lerc_zstd": CogSparkProfile(compression="zstd", lossy=True),
    "raw": CogSparkProfile(compression="uncompressed"),
}


class COGProfiles(dict):
    """Profile registry — reference profiles.py:154-187."""

    def __init__(self) -> None:
        super().__init__(_PROFILES)

    def get(self, key: str) -> CogSparkProfile:  # type: ignore[override]
        """Like the reference: KeyError on unknown profile; returns a copy."""
        if key not in self:
            raise KeyError(f"{key} is not a valid profile name")
        return CogSparkProfile(dict(self[key]))


cog_profiles = COGProfiles()
