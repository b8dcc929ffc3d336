"""Concrete file formats on top of the minnow container.

``minh_device`` / ``minp_device`` (the device-batched readers) are NOT
imported here: they pull in jax, and host-side file IO must never
initialize an accelerator runtime.  Import them explicitly.
"""

from . import boundary, minh, minp
