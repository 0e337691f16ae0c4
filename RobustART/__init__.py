"""RobustART compatibility shim.

Drop-in import compatibility with the reference package layout
(reference RobustART/__init__.py): ``from RobustART.noise import AddNoise``
etc. resolve to the TPU-native implementations in robustart_tpu.
"""

from robustart_tpu import __version__  # noqa: F401
