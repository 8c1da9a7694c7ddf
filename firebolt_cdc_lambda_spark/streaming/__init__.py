from .cdc_stream import CdcStream

__all__ = ["CdcStream"]
