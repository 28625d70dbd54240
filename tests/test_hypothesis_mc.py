"""Hypothesis property tests for the pure-Python MC core (no Spark per
example — these run hundreds of generated cases cheaply).

Targets the two pieces whose correctness is load-bearing for the whole
battery: deterministic seed derivation (retry safety) and the reference
call-convention dispatch (parallel_simulations.py:80-95 parity plus the
4th combo)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from parallel_monte_carlo_simulations_spark.mc.battery import _call_model
from parallel_monte_carlo_simulations_spark.mc.seeds import rng_for, seed_sequence_for

ids = st.integers(min_value=0, max_value=2**31 - 1)
seeds = st.integers(min_value=0, max_value=2**62)


@given(master=seeds, model_id=ids, sim_id=ids)
@settings(max_examples=200, deadline=None)
def test_seed_derivation_deterministic(master, model_id, sim_id):
    a = rng_for(np.random.PCG64, master, model_id, sim_id).random(4)
    b = rng_for(np.random.PCG64, master, model_id, sim_id).random(4)
    assert (a == b).all()


@given(master=seeds, m1=ids, s1=ids, m2=ids, s2=ids)
@settings(max_examples=200, deadline=None)
def test_seed_derivation_distinct_streams(master, m1, s1, m2, s2):
    """Different (model_id, sim_id) coordinates must yield different
    streams (SeedSequence guarantees independence; we check the streams
    actually differ, which also guards against accidentally ignoring a
    coordinate)."""
    if (m1, s1) == (m2, s2):
        return
    a = rng_for(np.random.PCG64, master, m1, s1).random(8)
    b = rng_for(np.random.PCG64, master, m2, s2).random(8)
    assert not (a == b).all()


@given(
    n=st.integers(min_value=1, max_value=50),
    has_params=st.booleans(),
    has_start=st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_call_model_arity_dispatch(n, has_params, has_start):
    """Every parameters/starting_point combination reaches the model with
    exactly the arguments the reference convention prescribes — including
    the combo the reference drops (starting_point without parameters)."""
    seen = {}

    def model(number_points, rng, parameters=None, starting_point=None):
        seen["args"] = (number_points, parameters, starting_point)
        return ["x"] * number_points

    params = [0.5] if has_params else None
    start = ["T", "T"] if has_start else None
    rng = np.random.Generator(np.random.PCG64(1))
    trace = _call_model(model, n, rng, params, start)
    assert len(trace) == n
    assert seen["args"] == (n, params, start)


@given(master=seeds, model_id=ids, sim_id=ids)
@settings(max_examples=100, deadline=None)
def test_seed_sequence_spawns_stable_entropy(master, model_id, sim_id):
    ss1 = seed_sequence_for(master, model_id, sim_id)
    ss2 = seed_sequence_for(master, model_id, sim_id)
    assert ss1.entropy == ss2.entropy == [master, model_id, sim_id]
