"""Registry invariants: priority names resolve, oracles exist, order holds."""

from __future__ import annotations

from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
    _PRIORITY,
    ORACLES,
    QUERIES,
    load_all_queries,
)


def test_priority_names_all_registered():
    load_all_queries()
    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not registered (typo?): {missing}"


def test_priority_block_leads_registration_order():
    load_all_queries()
    names = list(QUERIES)
    assert names[: len(_PRIORITY)] == [n for n in _PRIORITY if n in QUERIES]


def test_every_query_has_oracle():
    load_all_queries()
    assert set(QUERIES) == set(ORACLES)


def test_no_duplicate_priority_entries():
    assert len(_PRIORITY) == len(set(_PRIORITY))
