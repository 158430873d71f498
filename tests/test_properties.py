"""Property-based tests (hypothesis) for the engine's pure-Python
kernels — no SparkSession needed, so these run in milliseconds and
explore corners the example-based tests don't."""

from __future__ import annotations

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from agent_data_pipeline_spark.llmdata.similarity import _kmeans_fit
from agent_data_pipeline_spark.schema.evolve import zone_from_path
from agent_data_pipeline_spark.schema.infer import sanitize_identifier

_IDENT = re.compile(r"^[A-Za-z_][0-9A-Za-z_]*$|^_$")


@given(st.text(min_size=0, max_size=80))
@settings(max_examples=300)
def test_sanitize_identifier_always_valid(name):
    out = sanitize_identifier(name)
    assert _IDENT.match(out), (name, out)


@given(st.text(min_size=0, max_size=80))
@settings(max_examples=200)
def test_sanitize_identifier_idempotent(name):
    once = sanitize_identifier(name)
    assert sanitize_identifier(once) == once


@given(st.text(alphabet=st.characters(blacklist_characters="\x00"), max_size=120))
@settings(max_examples=200)
def test_zone_from_path_total(path):
    assert zone_from_path(path) in ("raw", "staging", "analytics")


@given(
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=25, deadline=None)
def test_kmeans_deterministic_and_bounded(n, k, seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 4))
    a = _kmeans_fit(x, k, seed=42, iters=5)
    b = _kmeans_fit(x, k, seed=42, iters=5)
    assert np.array_equal(a, b)  # same seed + data => identical index
    assert a.shape == (min(k, n), 4)
    # centroids live inside the data's bounding box (means of members)
    assert a.min() >= x.min() - 1e-9 and a.max() <= x.max() + 1e-9
