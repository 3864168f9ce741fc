from photons_tpu.tree.morton import morton_keys, morton_sort
from photons_tpu.tree.build import Tree, build_tree

__all__ = ["Tree", "build_tree", "morton_keys", "morton_sort"]
