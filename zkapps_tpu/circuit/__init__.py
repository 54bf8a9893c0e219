from .context import AssignedValue, Context
from .gates import GateChip
from .poseidon_gadget import PoseidonGadget

__all__ = ["Context", "AssignedValue", "GateChip", "PoseidonGadget"]
