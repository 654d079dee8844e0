"""Engine error type.

Parity: reference ``puffbird/err.py:1-9`` defines a single ``PuffbirdError``.
"""


class PuffbirdSparkError(Exception):
    """Raised for all engine-level usage errors (bad column names, reserved
    identifiers, non-unique keys, invalid shared-axes arguments, ...)."""
