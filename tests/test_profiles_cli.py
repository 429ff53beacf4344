"""Profile registry semantics (reference tests/test_profile.py) + models."""

import pytest

from rio_cogeo_spark.models import Info, Profile, Geo
from rio_cogeo_spark.profiles import cog_profiles


def test_profiles_registry_names():
    # same name surface as the reference registry (profiles.py:154-187)
    for name in ["jpeg", "webp", "zstd", "lzw", "deflate", "packbits",
                 "lzma", "lerc", "lerc_deflate", "lerc_zstd", "raw"]:
        p = cog_profiles.get(name)
        assert p["blockxsize"] == 512 and p["blockysize"] == 512
        assert p["tiled"] is True
        assert p["interleave"] == "pixel"


def test_profiles_unknown_raises():
    with pytest.raises(KeyError):
        cog_profiles.get("unknown")


def test_profiles_copy_on_get():
    # reference tests/test_profile.py:118-123: mutating a copy must not
    # leak into the registry
    p = cog_profiles.get("zstd")
    p["compression"] = "mutated"
    assert cog_profiles.get("zstd")["compression"] == "zstd"


def test_lossy_profiles_flagged():
    assert cog_profiles.get("jpeg").get("lossy") is True
    assert cog_profiles.get("raw").get("lossy") is None


def test_info_model_shape():
    info = Info(
        Path="t", Driver="parquet", COG=True, Compression="zstd",
        ColorSpace=None, COG_errors=None, COG_warnings=None,
        Profile=Profile(Bands=1, Width=10, Height=10, Tiled=True,
                        Dtype="int64", Interleave="pixel",
                        AlphaBand=False, InternalMask=False),
        GEO=Geo(CRS="EPSG:3857", BoundingBox=(0, 0, 1, 1),
                Origin=(0, 1), Resolution=(1, -1)),
    )
    d = info.dict()
    assert d["COG"] is True and d["GEO"]["CRS"] == "EPSG:3857"
    assert d["Profile"]["Bands"] == 1
