"""Engine errors — mirrors /root/reference/rio_cogeo/errors.py:1-21."""


class CogSparkError(Exception):
    """Base error."""


class IncompatibleOptions(CogSparkError):
    """Invalid option combination (reference errors.py:16-17), e.g.
    colormap on a multi-band tile set (cogeo.py:231-234)."""


class IncompatibleBlockRasterSize(CogSparkError):
    """Blocksize incompatible with raster extent (reference errors.py:12-13)."""


class LossyCompression(Warning):
    """Lossy compression warning (reference errors.py:8-9)."""


class NodataAlphaMaskWarning(Warning):
    """Nodata + alpha/mask both present (reference cogeo.py:225-229)."""
