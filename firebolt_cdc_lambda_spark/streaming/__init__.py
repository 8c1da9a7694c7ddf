from .cdc_stream import CdcStream
from .neardup import NearDupStream

__all__ = ["CdcStream", "NearDupStream"]
