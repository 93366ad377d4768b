"""Deterministic seeding (reference: ann_solo/rndm.py)."""

import os
import random

import numpy as np


def set_seeds(my_seed: int = 42) -> None:
    """Seed Python, NumPy, and the hash seed for reproducible runs."""
    os.environ["PYTHONHASHSEED"] = str(my_seed)
    random.seed(my_seed)
    np.random.seed(my_seed)
