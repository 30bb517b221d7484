"""Registry integrity audit (VERDICT r9 ask #2).

Two structural guards against the decorator-misplacement class that
commit c737257 had to repair (a bare ``@query(...)`` inserted above an
existing decorated function stacks both decorators onto one callable,
silently re-registering the wrong function):

1. ``registry.query`` raises on duplicate names (tested directly);
2. every registered callable's ``__name__`` must match its
   registration key (the repo convention: ``<key>``, ``<key>_query``,
   or ``<key>_q``) — a stacked decorator registers a function whose
   name belongs to a DIFFERENT key, which this catches at test time
   even for a never-before-seen key.
"""

import pytest

import __spark_entry__ as entry
from glamira_batch_processing_spark.plans.registry import ORACLE, QUERIES, query

_NAME_SUFFIXES = ("", "_query", "_q")


def test_every_callable_name_matches_its_registration_key():
    assert QUERIES, "registry import produced no queries"
    bad = {
        key: fn.__name__
        for key, fn in QUERIES.items()
        if fn.__name__ not in tuple(key + s for s in _NAME_SUFFIXES)
    }
    assert not bad, (
        "registered callables whose __name__ does not match their key "
        f"(stacked/misplaced @query decorator?): {bad}"
    )


def test_duplicate_registration_raises():
    key = next(iter(QUERIES))
    with pytest.raises(ValueError, match="duplicate query registration"):

        @query(key)
        def _imposter(spark, sf_dir):  # pragma: no cover - never runs
            raise AssertionError

    # the original registration must be untouched by the failed attempt
    assert QUERIES[key].__name__ != "_imposter"


def test_every_oracle_has_a_query():
    orphans = set(ORACLE) - set(QUERIES)
    assert not orphans, f"oracle SQL with no registered query: {orphans}"


def test_entry_exports_match_registry():
    assert entry.queries() is QUERIES or entry.queries() == QUERIES
    assert set(entry.oracle_sql()) == set(ORACLE)
