"""End-to-end property test: pipeline ∘ generate == oracle ∘ generate for
randomly drawn generator seeds (FIXTURES.md §3 'property-based')."""

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocrautomator_ray import synth

from .util import run_and_compare


@pytest.mark.usefixtures("ray_session")
@given(seed=st.integers(0, 10**6), rows=st.integers(5, 40))
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pipeline_equals_oracle_for_random_tables(seed, rows):
    t = synth.gen_table("sf-test", seed=seed, rows=rows)
    with tempfile.TemporaryDirectory() as out:
        run_and_compare(t, out, num_partitions=4)
