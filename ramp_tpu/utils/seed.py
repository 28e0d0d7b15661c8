"""Seeding helper (ref `deps/torch_robotics/.../seed.py:7`).

JAX randomness is explicit (threaded PRNG keys); this only seeds the
host-side numpy generator used by dataset generation utilities.
"""
import random

import numpy as np


def fix_random_seed(seed: int = 0):
    random.seed(seed)
    np.random.seed(seed)
