from .tree import TreeRBACGenerator
from .sharing_tree import SharingTreeRBACGenerator
from .erbac import ERBACGenerator
from .random_gen import RandomRBACGenerator
from .arxiv_business import ArxivBusinessRBACGenerator

GENERATORS = {
    "tree": TreeRBACGenerator,
    "sharing_tree": SharingTreeRBACGenerator,
    "erbac": ERBACGenerator,
    "random": RandomRBACGenerator,
    "arxiv_business": ArxivBusinessRBACGenerator,
}

__all__ = [
    "TreeRBACGenerator",
    "SharingTreeRBACGenerator",
    "ERBACGenerator",
    "RandomRBACGenerator",
    "ArxivBusinessRBACGenerator",
    "GENERATORS",
]
