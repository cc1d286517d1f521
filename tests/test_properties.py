"""Property-based checks (hypothesis) for inference/healing paths
(SURVEY.md §5 strategy #4): the TEXT-on-mixed rule and normalization
idempotence hold for arbitrary inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from self_healing_data_pipeline_spark.functions.scalar import sanitize_identifier

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    ints=st.lists(st.integers(-10**9, 10**9).map(str), min_size=1, max_size=5),
    words=st.lists(st.text("abcXYZ _", min_size=1, max_size=8), min_size=1, max_size=5),
)
@settings(**_SETTINGS)
def test_mixed_numeric_and_text_always_falls_back_to_text(spark, ints, words):
    from self_healing_data_pipeline_spark.plans.profiler import profile_dataframe

    # a column that mixes parseable ints with non-numeric words must be TEXT
    words = [w for w in words if not w.strip().lstrip("+-").isdigit()]
    if not words:
        words = ["xyz"]
    vals = [(v,) for v in ints + words]
    df = spark.createDataFrame(vals, "c string")
    out = profile_dataframe(df, "t").columns[0]
    assert out.inferred_sql_type == "TEXT"


@given(vals=st.lists(st.integers(-10**12, 10**12).map(str), min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_all_int_strings_promote_to_integer(spark, vals):
    from self_healing_data_pipeline_spark.plans.profiler import profile_dataframe

    df = spark.createDataFrame([(v,) for v in vals], "c string")
    out = profile_dataframe(df, "t").columns[0]
    assert out.inferred_sql_type == "INTEGER"


@given(name=st.text(min_size=0, max_size=40))
@settings(max_examples=50, deadline=None)
def test_sanitize_identifier_always_safe(name):
    out = sanitize_identifier(name)
    assert out
    assert all(c.isalnum() or c == "_" for c in out)
    # idempotent
    assert sanitize_identifier(out) == out


@given(
    w=st.integers(1, 2**31 - 1),
    h=st.integers(1, 2**31 - 1),
    body=st.binary(max_size=64),
)
@settings(**_SETTINGS)
def test_png_header_round_trip_any_dims(w, h, body):
    from self_healing_data_pipeline_spark.operators.multimodal import (
        parse_image_dims,
        png_bytes,
    )

    assert parse_image_dims(png_bytes(w, h) + body) == ("png", w, h)


@given(
    w=st.integers(1, 65535),
    h=st.integers(1, 65535),
    body=st.binary(max_size=64),
)
@settings(**_SETTINGS)
def test_jpeg_header_round_trip_any_dims(w, h, body):
    from self_healing_data_pipeline_spark.operators.multimodal import (
        jpeg_bytes,
        parse_image_dims,
    )

    assert parse_image_dims(jpeg_bytes(w, h) + body) == ("jpeg", w, h)


@given(junk=st.binary(max_size=200))
@settings(**_SETTINGS)
def test_parse_image_dims_never_raises_on_junk(junk):
    from self_healing_data_pipeline_spark.operators.multimodal import (
        parse_image_dims,
    )

    fmt, w, h = parse_image_dims(junk)  # must classify or reject, not throw
    if fmt is None:
        assert (w, h) == (None, None)


_LATTICE_TYPES = None


def _lattice_types():
    global _LATTICE_TYPES
    if _LATTICE_TYPES is None:
        from pyspark.sql import types as T

        _LATTICE_TYPES = [
            T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
            T.FloatType(), T.DoubleType(), T.DateType(),
            T.TimestampNTZType(), T.TimestampType(), T.StringType(),
            T.DecimalType(10, 2), T.DecimalType(18, 4), T.BooleanType(),
        ]
    return _LATTICE_TYPES


@given(i=st.integers(0, 12), j=st.integers(0, 12))
@settings(**_SETTINGS)
def test_widen_type_is_commutative_and_idempotent(i, j):
    from self_healing_data_pipeline_spark.operators.schema_evolution import (
        widen_type,
    )

    ts = _lattice_types()
    a, b = ts[i], ts[j]
    w = widen_type(a, b)
    # commutative: drift direction must not change the healed schema
    assert w == widen_type(b, a)
    # idempotent upper bound: widening again with either input is a no-op
    assert widen_type(w, a) == w
    assert widen_type(w, b) == w
    # self-join identity
    assert widen_type(a, a) == a


@given(i=st.integers(0, 12), j=st.integers(0, 12), k=st.integers(0, 12))
@settings(**_SETTINGS)
def test_widen_type_is_associative(i, j, k):
    from self_healing_data_pipeline_spark.operators.schema_evolution import (
        widen_type,
    )

    ts = _lattice_types()
    a, b, c = ts[i], ts[j], ts[k]
    # batch arrival order must not change the evolved schema
    assert widen_type(widen_type(a, b), c) == widen_type(a, widen_type(b, c))
