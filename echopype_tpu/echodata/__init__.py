from .api import open_converted
from .echodata import EchoData

__all__ = ["EchoData", "open_converted"]
