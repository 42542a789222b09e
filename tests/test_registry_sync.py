"""Documentation/registry drift gates (round-4 verdict item 8): the
README's query counts and the bench HEADLINE list must track the live
registry — counts drifted every round they were maintained by hand."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_query_count_matches_registry():
    from chatbot_spark.workload import ORACLE_SQL, SPARK_QUERIES

    with open(os.path.join(REPO, "README.md")) as f:
        readme = f.read()
    m = re.search(
        r"(\d+) workload queries ship,\s*all (\d+) with DuckDB oracles", readme
    )
    assert m, "README must state the query/oracle counts"
    assert int(m.group(1)) == len(SPARK_QUERIES), (
        f"README says {m.group(1)} queries, registry has {len(SPARK_QUERIES)}"
    )
    assert int(m.group(2)) == len(ORACLE_SQL), (
        f"README says {m.group(2)} oracles, registry has {len(ORACLE_SQL)}"
    )


def test_every_query_has_an_oracle():
    """The t2 contract: every queries() entry ships a DuckDB oracle (the
    driver records a weaker rows-only check otherwise)."""
    from chatbot_spark.workload import ORACLE_SQL, SPARK_QUERIES

    assert set(SPARK_QUERIES) == set(ORACLE_SQL)


def test_bench_sf1_pinned_names_are_registered():
    """The frozen sf1 entry list (round-5 verdict item 4) must stay in
    sync with the registry — a renamed query would silently drop out of
    the sf1 comparison otherwise."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from bench_sf1 import PINNED

    from chatbot_spark.workload import SPARK_QUERIES

    unknown = [n for n in PINNED if n not in SPARK_QUERIES]
    assert not unknown, f"pinned sf1 entries not in registry: {unknown}"
    assert len(set(PINNED)) == len(PINNED), "duplicate pinned sf1 entries"


def test_bench_headline_names_are_registered():
    import sys

    sys.path.insert(0, REPO)
    from bench import HEADLINE

    from chatbot_spark.workload import SPARK_QUERIES

    unknown = [n for n in HEADLINE if n not in SPARK_QUERIES]
    assert not unknown, f"bench HEADLINE references unregistered queries: {unknown}"
    assert len(set(HEADLINE)) == len(HEADLINE), "duplicate HEADLINE entries"


def test_rotation_recheck_and_priority_names_are_registered():
    """A renamed query would silently drop out of the rotation tiers —
    the RECHECK tier especially must track the registry, since its whole
    point is forcing re-verification of semantically-changed queries."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "_entry_under_test", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_entry_under_test"] = mod
    spec.loader.exec_module(mod)

    from chatbot_spark.workload import SPARK_QUERIES

    unknown = [n for n in mod._RECHECK if n not in SPARK_QUERIES]
    assert not unknown, f"_RECHECK names not in registry: {unknown}"
    unknown_p = [n for n in mod._PRIORITY if n not in SPARK_QUERIES]
    assert not unknown_p, f"_PRIORITY names not in registry: {unknown_p}"
