"""Docs-as-tests (reference docs/duckdoc.py parity): the committed
function reference must match a fresh render, and every example in it
must execute cleanly against a real SparkSession."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

import gendoc  # noqa: E402

DOC_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "function-reference.md",
)


def test_reference_doc_is_current():
    want = gendoc.render(gendoc.collect())
    with open(DOC_PATH) as fh:
        got = fh.read()
    assert got == want, (
        "docs/function-reference.md is stale — run `python scripts/gendoc.py`"
    )


def test_reference_parity_page_is_current():
    want = gendoc.render_parity(gendoc.collect())
    path = os.path.join(os.path.dirname(DOC_PATH), "reference-parity.md")
    with open(path) as fh:
        got = fh.read()
    assert got == want, (
        "docs/reference-parity.md is stale — run `python scripts/gendoc.py`"
    )


def test_reference_parity_covers_every_registered_function():
    """The parity map must cover EVERY s2_* function the reference's
    C++ registers (the VERDICT census), each mapped to a same-named
    documented repo function and to a live driver gate."""
    documented = {
        f["name"] for cat in gendoc.collect() for f in cat["functions"]
    }
    assert len(gendoc.REF_PARITY) >= 57
    missing_repo = sorted(set(gendoc.REF_PARITY) - documented)
    assert missing_repo == [], missing_repo

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as entry

    gates = set(entry.queries())
    bad_gates = sorted(
        {g for (_, _, g) in gendoc.REF_PARITY.values()} - gates
    )
    assert bad_gates == [], bad_gates


def test_every_documented_function_has_a_docstring():
    undocumented = [
        f["name"]
        for cat in gendoc.collect()
        for f in cat["functions"]
        if not f["doc"]
    ]
    assert undocumented == [], undocumented


@pytest.mark.parametrize("name", sorted(gendoc.EXAMPLES))
def test_example_runs(spark, name):
    ns = gendoc.example_namespace(spark)
    code = gendoc.EXAMPLES[name]
    exec(compile(code, f"<example:{name}>", "exec"), ns)  # noqa: S102


def test_examples_reference_real_functions():
    documented = {
        f["name"] for cat in gendoc.collect() for f in cat["functions"]
    }
    orphans = set(gendoc.EXAMPLES) - documented
    assert orphans == set(), orphans
