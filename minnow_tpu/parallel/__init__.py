import jax as _jax

_jax.config.update("jax_enable_x64", True)

from . import mesh  # noqa: E402
from .pipeline import BlockEncoder, EncodedBlocks  # noqa: E402
