from .bn254_pairing import FQ12_ONE, miller_loop, pairing, pairing_check

__all__ = ["pairing", "pairing_check", "miller_loop", "FQ12_ONE"]
