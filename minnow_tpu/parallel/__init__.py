from . import mesh
from .pipeline import BlockEncoder, EncodedBlocks
