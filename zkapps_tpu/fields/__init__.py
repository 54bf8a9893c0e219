from .host import Fq, Fr, FQ_MODULUS, FR_MODULUS, PrimeField
from .jnp_ops import FQ, FR, LimbField, get_field, get_unroll, set_unroll
from .limbs import (
    LIMB_BITS,
    LIMB_MASK,
    N_LIMBS,
    int_to_limbs,
    ints_to_limbs,
    limbs_to_int,
    limbs_to_ints,
)

__all__ = [
    "Fq",
    "Fr",
    "FQ",
    "FR",
    "FQ_MODULUS",
    "FR_MODULUS",
    "PrimeField",
    "LimbField",
    "get_field",
    "LIMB_BITS",
    "LIMB_MASK",
    "N_LIMBS",
    "int_to_limbs",
    "ints_to_limbs",
    "limbs_to_int",
    "limbs_to_ints",
]
