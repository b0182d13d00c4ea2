"""Determinism helpers (set_seed, /root/reference/utils.py:17-25).

JAX randomness is explicit (PRNG keys threaded through the pipeline), so
unlike the torch reference there is no hidden global device RNG; this seeds
the host-side numpy/random generators used by samplers and pose jitter.
"""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int, base: int = 0):
    seed += base
    assert seed >= 0
    np.random.seed(seed)
    random.seed(seed)
    return seed
