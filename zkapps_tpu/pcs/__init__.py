from .ipa import IPA, IPAParams, ipa_setup
from .kzg import KZG
from .srs import SRS, get_srs, setup

__all__ = ["KZG", "IPA", "IPAParams", "ipa_setup", "SRS", "setup", "get_srs"]
