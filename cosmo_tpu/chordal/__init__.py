from .decompose import decompose, reverse
from .transform import ChordalInfo, SparsityPattern

__all__ = ["decompose", "reverse", "ChordalInfo", "SparsityPattern"]
