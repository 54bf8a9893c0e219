from .keygen import CircuitLayout, PlonkPK, PlonkVK, keygen
from .mock import ConstraintFailure, check_circuit
from .prover import prove
from .verifier import verify

__all__ = [
    "keygen",
    "prove",
    "verify",
    "check_circuit",
    "ConstraintFailure",
    "PlonkPK",
    "PlonkVK",
    "CircuitLayout",
]
