"""Round-4 regression tests for the round-3 ADVICE.md findings.

1. url_query must not read a '?' that only appears inside the URL
   fragment as a query string (fragment stripped before extraction).
2. registered_domain returns '' for single-label hosts (doc now
   matches behavior).
3. dedup_lines treats ``sep`` as a literal separator, not a Java
   regex ('.'/'|' must not split per-character).
4. funnel_stages: NULL-timestamp events never advance a stage, and a
   user whose every event is NULL-ts still appears at stage 0.
"""

from __future__ import annotations

import datetime

import pytest


class TestUrlQueryFragment:
    def test_question_mark_inside_fragment_is_not_a_query(self, spark):
        from duckdb_geography_spark.llm import web as W
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [
                ("https://a.com/p#f?x=1",),
                ("https://a.com/p?x=1#f",),
                ("https://a.com/p?a=1&b=2#frag?c=3",),
            ],
            ["url"],
        )
        rows = df.select(
            W.url_query("url").alias("q"),
            W.normalize_url("url").alias("norm"),
        ).collect()
        assert rows[0]["q"] == ""
        assert rows[0]["norm"] == "https://a.com/p"
        assert rows[1]["q"] == "x=1"
        assert rows[1]["norm"] == "https://a.com/p?x=1"
        assert rows[2]["q"] == "a=1&b=2"
        assert rows[2]["norm"] == "https://a.com/p?a=1&b=2"

    def test_registered_domain_single_label_is_empty(self, spark):
        from duckdb_geography_spark.llm import web as W

        df = spark.createDataFrame(
            [("localhost",), ("example.com",), ("a.b.example.com",)], ["h"]
        )
        got = [r[0] for r in df.select(W.registered_domain("h")).collect()]
        assert got == ["", "example.com", "example.com"]


class TestDedupLinesLiteralSep:
    @pytest.mark.parametrize("sep", [".", "|", "\n"])
    def test_sep_is_literal(self, spark, sep):
        from duckdb_geography_spark.llm.prep import dedup_lines

        # 'common' appears in both docs -> dropped at max_df=1;
        # the uniques survive intact (NOT split per-character).
        df = spark.createDataFrame(
            [
                (1, sep.join(["common", "alpha one"])),
                (2, sep.join(["common", "beta two"])),
            ],
            ["doc_id", "text"],
        )
        got = {
            r["doc_id"]: r["text_clean"]
            for r in dedup_lines(df, sep=sep).collect()
        }
        assert got == {1: "alpha one", 2: "beta two"}

    def test_regex_literal_helper(self):
        import re

        from duckdb_geography_spark.llm.prep import _regex_literal

        for s in [".", "|", "a.b", "[x]", "a+b*c", "\\", "(p)", "^$", "{2}"]:
            pat = _regex_literal(s)
            # escaped pattern must match exactly the literal and split
            # like a literal separator
            assert re.fullmatch(pat, s), (s, pat)
            assert re.split(pat, f"L{s}R") == ["L", "R"]


class TestFunnelNullTs:
    def test_null_ts_events_do_not_chain_stages(self, spark):
        from duckdb_geography_spark.streaming.events import funnel_stages

        t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            # u1: view/click/purchase all NULL ts -> no temporal order,
            # stage must stay 0 (previously NULL events chained to 3)
            ("u1", None, "view"),
            ("u1", None, "click"),
            ("u1", None, "purchase"),
            # u2: real ordered funnel -> 3
            ("u2", t0, "view"),
            ("u2", t0 + datetime.timedelta(seconds=1), "click"),
            ("u2", t0 + datetime.timedelta(seconds=2), "purchase"),
            # u3: NULL-ts click must not bridge view->purchase -> 1
            ("u3", t0, "view"),
            ("u3", None, "click"),
            ("u3", t0 + datetime.timedelta(seconds=5), "purchase"),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        got = {
            r["user_id"]: r["stage"]
            for r in funnel_stages(df, ["view", "click", "purchase"]).collect()
        }
        assert got == {"u1": 0, "u2": 3, "u3": 1}


class TestHoleNestingValidation:
    def test_hole_outside_shell_is_invalid(self):
        from duckdb_geography_spark.geo.geography import (
            from_wkt,
            validation_error,
        )

        bad = (
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
            "(10 10, 11 10, 11 11, 10 11, 10 10))"
        )
        g = from_wkt(bad, validate=False)
        assert validation_error(g) == "Hole 1 is not contained in its shell"
        import pytest as _pytest

        with _pytest.raises(ValueError):
            from_wkt(bad)

    def test_proper_hole_still_valid(self):
        from duckdb_geography_spark.geo.geography import (
            from_wkt,
            validation_error,
        )

        good = (
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
            "(1 1, 2 1, 2 2, 1 2, 1 1))"
        )
        assert validation_error(from_wkt(good)) is None


class TestCatalogFunctionComments:
    def test_describe_function_carries_comment(self, spark):
        # FunctionBuilder parity (reference src/function_builder.cpp):
        # the SQL-DDL cell functions install a description the catalog
        # can surface through DESCRIBE FUNCTION
        from duckdb_geography_spark.functions.register import (
            register_sql_functions,
        )

        register_sql_functions(spark)
        for fn, frag in [
            ("s2_cell_parent", "parent S2_CELL"),
            ("s2_cell_token", "hexadecimal token"),
            ("s2_cell_level", "level (0-30"),
        ]:
            txt = "\n".join(
                r[0] for r in spark.sql(f"DESCRIBE FUNCTION {fn}").collect()
            )
            assert frag in txt, (fn, txt[:200])
