from .kzg import KZG
from .srs import SRS, get_srs, setup

__all__ = ["KZG", "SRS", "setup", "get_srs"]
