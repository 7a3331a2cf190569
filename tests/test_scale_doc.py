"""SCALE.md rot check (r11 verdict #6, modeled on test_examples_doc.py):
the appendix at the bottom of SCALE.md maps every driver-catalog query
to the family section whose scaling discipline covers it. This test
fails when a new catalog query lacks a mapping (an operator landed
without a scale note), when the appendix names a query that no longer
exists, when a query is claimed by two sections, or when a mapping
points at a section header that was renamed or removed."""

import os
import re

import pytest

_DOC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
)
_APPENDIX_HEADER = "## Appendix: catalog query → family section map"


@pytest.fixture(scope="module")
def catalog_names():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

    return set(QUERIES)


def _doc_parts():
    text = open(_DOC).read()
    assert _APPENDIX_HEADER in text, "SCALE.md appendix map is missing"
    body, appendix = text.split(_APPENDIX_HEADER, 1)
    return body, appendix


def _appendix_map():
    """{query_name: section_title} parsed from the appendix bullets."""
    _, appendix = _doc_parts()
    mapping = {}
    dups = []
    for section, names_blob in re.findall(
        r"^- \*\*(.+?)\*\*: (.+)$", appendix, re.MULTILINE
    ):
        for name in re.findall(r"`([a-z0-9_]+)`", names_blob):
            if name in mapping:
                dups.append(name)
            mapping[name] = section
    assert not dups, f"queries claimed by two sections: {sorted(set(dups))}"
    return mapping


def test_every_catalog_query_has_a_scale_section(catalog_names):
    unmapped = catalog_names - set(_appendix_map())
    assert not unmapped, (
        f"catalog queries with no SCALE.md mapping (add each to the "
        f"appendix under the family section that covers its scale "
        f"posture): {sorted(unmapped)}"
    )


def test_no_stale_appendix_entries(catalog_names):
    stale = set(_appendix_map()) - catalog_names
    assert not stale, (
        f"SCALE.md appendix names queries not in the catalog "
        f"(renamed or removed): {sorted(stale)}"
    )


def test_every_mapped_section_exists():
    body, _ = _doc_parts()
    sections = set(re.findall(r"^## (.+)$", body, re.MULTILINE))
    missing = {s for s in _appendix_map().values() if s not in sections}
    assert not missing, (
        f"appendix points at section headers that do not exist in "
        f"SCALE.md: {sorted(missing)}"
    )
