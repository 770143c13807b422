"""Round-10 regression pins.

1. The bounded-output gate variants (SPARK_GRAFT_BOUNDED_GATES=1,
   __spark_entry__._bounded_gates) must be a NO-OP at the driver's
   sf0.01 — every knob resolves to its default there, so the driver's
   correctness run and bench workloads are unchanged by the flag.
2. embedding_sim_pairs emits an INTEGER quantized cosine (cos4q):
   the r10 sf1 replay caught Spark's F.round rounding the decimal
   string repr (HALF_UP on "0.72125" -> 0.7213) while DuckDB rounds
   the binary double (0.7212499... -> 0.7212) — divided floats must
   never be double-rounded into a gate hash.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import LongType

import __spark_entry__ as e

SF = "/root/testdata/sf0.01"


@pytest.fixture
def bounded_flag():
    old = os.environ.get("SPARK_GRAFT_BOUNDED_GATES")
    yield
    if old is None:
        os.environ.pop("SPARK_GRAFT_BOUNDED_GATES", None)
    else:
        os.environ["SPARK_GRAFT_BOUNDED_GATES"] = old


class TestBoundedGateKnobs:
    def test_knobs_are_noop_at_sf001(self, bounded_flag):
        os.environ["SPARK_GRAFT_BOUNDED_GATES"] = "1"
        assert e._bounded_mod(SF, "documents") == 1
        assert e._bounded_mod(SF, "embeddings") == 1
        assert e._haversine_threshold_m(SF) == 2_000_000.0
        os.environ.pop("SPARK_GRAFT_BOUNDED_GATES")
        assert e._bounded_mod("/root/repo/.scale/sf1", "documents") == 1
        assert e._haversine_threshold_m("/root/repo/.scale/sf1") == 2_000_000.0

    def test_knobs_scale_with_rows(self, bounded_flag):
        os.environ["SPARK_GRAFT_BOUNDED_GATES"] = "1"
        # m ~ rows/500 from parquet footers; sf0.1 carries 5000 docs /
        # 2000 embeddings
        assert e._bounded_mod("/root/testdata/sf0.1", "documents") == 10
        assert e._bounded_mod("/root/testdata/sf0.1", "embeddings") == 4
        thr = e._haversine_threshold_m("/root/testdata/sf0.1")
        # 15000 x 1000 = 100x the sf0.01 pair count -> cutoff / 10
        assert abs(thr - 200_000.0) < 1e-6

    def test_gate_output_identical_flag_on_off_at_sf001(
        self, spark, bounded_flag
    ):
        for name in ("haversine_pairs", "minhash_lsh_candidates"):
            os.environ.pop("SPARK_GRAFT_BOUNDED_GATES", None)
            off = e.queries()[name](spark, SF).toPandas()
            os.environ["SPARK_GRAFT_BOUNDED_GATES"] = "1"
            on = e.queries()[name](spark, SF).toPandas()
            assert off.equals(on), name


def test_embedding_sim_pairs_emits_integer_cosine(spark):
    df = e.queries()["embedding_sim_pairs"](spark, SF)
    field = {f.name: f.dataType for f in df.schema.fields}["cos4q"]
    assert isinstance(field, LongType)
    rows = df.limit(5).collect()
    assert rows and all(isinstance(r.cos4q, int) for r in rows)
