from .host import naive_eval, ntt_host
from .jnp_ntt import NTTPlan, bitrev_permutation, get_plan, powers_device

__all__ = ["naive_eval", "ntt_host", "NTTPlan", "get_plan", "powers_device", "bitrev_permutation"]
