"""Pure-numpy model implementations with in-repo weights (the offline
counterparts of the reference's downloaded-model paths)."""

from .tiny_transformer import TinyTransformer, build_vocab  # noqa: F401
