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
