"""Seeding (utils/random_seed.py parity).

JAX randomness is explicit-key based (every stochastic op in this framework
takes a PRNG key), so the reference's global-state seeding mostly maps to
choosing the seeds passed to Trainer/Model. This helper seeds the host-side
libraries (numpy/python hash) for data-pipeline determinism.
"""
import os
import random

import numpy as np


def set_seed(seed: int = 0):
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed
