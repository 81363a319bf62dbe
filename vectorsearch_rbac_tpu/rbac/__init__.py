from .world import RBACWorld
from .bitset import pack_role_sets, role_mask, WORD_BITS

__all__ = ["RBACWorld", "pack_role_sets", "role_mask", "WORD_BITS"]
