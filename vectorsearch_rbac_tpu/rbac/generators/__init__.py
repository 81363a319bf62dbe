from .tree import TreeRBACGenerator
from .sharing_tree import SharingTreeRBACGenerator
from .erbac import ERBACGenerator
from .random_gen import RandomRBACGenerator

GENERATORS = {
    "tree": TreeRBACGenerator,
    "sharing_tree": SharingTreeRBACGenerator,
    "erbac": ERBACGenerator,
    "random": RandomRBACGenerator,
}

__all__ = [
    "TreeRBACGenerator",
    "SharingTreeRBACGenerator",
    "ERBACGenerator",
    "RandomRBACGenerator",
    "GENERATORS",
]
