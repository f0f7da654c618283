"""dB <-> linear transforms, usable on numpy, jax, and xrlite arrays.

Capability parity: echopype/utils/compute.py:13,29.
"""

import numpy as np


def _log2lin(data):
    """10^(x/10): dB to linear domain."""
    return 10 ** (data / 10)


def _lin2log(data):
    """10*log10(x): linear to dB domain."""
    import jax

    if isinstance(data, jax.Array):
        import jax.numpy as jnp

        return 10 * jnp.log10(data)
    return 10 * np.log10(data)
