from .decompose import decompose, reverse
from .merging import CliqueGraphMerge, MergeStrategy, finish_graph_merge
from .transform import ChordalInfo, SparsityPattern

__all__ = [
    "decompose", "reverse", "ChordalInfo", "SparsityPattern",
    "MergeStrategy", "CliqueGraphMerge", "finish_graph_merge",
]
