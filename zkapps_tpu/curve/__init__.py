from .host import B_G1, B_G2, G1, G2, g1_msm, fq2_add, fq2_inv, fq2_mul, fq2_neg, fq2_sub
from .jnp_point import G1_JNP, JnpG1

__all__ = [
    "G1",
    "G2",
    "B_G1",
    "B_G2",
    "g1_msm",
    "G1_JNP",
    "JnpG1",
    "fq2_add",
    "fq2_sub",
    "fq2_mul",
    "fq2_neg",
    "fq2_inv",
]
