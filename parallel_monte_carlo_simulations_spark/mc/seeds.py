"""Deterministic, retry-safe seed derivation.

The reference draws unseeded random seeds on the driver
(``utils.py:8-12`` — ``random.randint`` into a set, non-reproducible and
order-unstable). Here every simulation's seed is a pure function of
``(master_seed, model_id, sim_id)`` via numpy's ``SeedSequence``, so:

- the same master seed reproduces every trace byte-for-byte,
- a Spark task retry re-derives identical seeds (no divergence),
- no seed state ships through the shuffle — tasks derive locally.
"""

from __future__ import annotations

import secrets

import numpy as np


def fresh_master_seed() -> int:
    """Entropy-pool master seed (used when the caller supplies none)."""
    return secrets.randbits(63)


def seed_sequence_for(master_seed: int, model_id: int, sim_id: int) -> np.random.SeedSequence:
    return np.random.SeedSequence([master_seed, model_id, sim_id])


def rng_for(bit_generator_cls, master_seed: int, model_id: int, sim_id: int) -> np.random.Generator:
    """Build the per-simulation Generator exactly like the reference does
    per model (``parallel_simulations.py:68-69``: ``Generator(BitGen(seed))``)
    but at per-simulation granularity."""
    return np.random.Generator(
        bit_generator_cls(seed_sequence_for(master_seed, model_id, sim_id))
    )
