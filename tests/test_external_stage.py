"""External-model healing stage — the reference's Gemini fallback
chain (fence strip, JSON re-parse, CREATE TABLE prefix gate, repair
re-ask) as a pluggable Stage, driven by deterministic fakes (no
network: the public-knowledge constraint makes a live call untestable
here, so the fakes pin the HEALING semantics, which is the part the
pipeline owns)."""

from __future__ import annotations

import pytest

from self_healing_data_pipeline_spark.pipeline.external_stage import (
    ExternalModelStage,
    extract_json,
    require_prefix,
    strip_fences,
)
from self_healing_data_pipeline_spark.pipeline.runner import (
    PipelineStep,
    SelfHealingPipeline,
)


def test_strip_fences_variants():
    assert strip_fences("```json\n{\"a\": 1}\n```") == '{"a": 1}'
    assert strip_fences("```sql\nSELECT 1\n```") == "SELECT 1"
    assert strip_fences("no fences") == "no fences"


def test_extract_json_fallback_chain():
    assert extract_json('{"a": 1}') == {"a": 1}
    assert extract_json('```json\n{"a": 1}\n```') == {"a": 1}
    # prose around the object -> balanced-substring fallback
    assert extract_json('Here is the schema: {"a": {"b": [1, 2]}} done') == {
        "a": {"b": [1, 2]}
    }
    assert extract_json("prefix [1, 2, 3] suffix") == [1, 2, 3]
    # braces inside strings must not confuse the scanner
    assert extract_json('x {"a": "}{", "b": 1} y') == {"a": "}{", "b": 1}
    # a balanced-but-invalid FIRST candidate must not mask a valid
    # later occurrence (scanner continues past failed candidates)
    assert extract_json('note {not json} then {"a": 1}') == {"a": 1}
    assert extract_json("bad [not, json,] ok [1, 2]") == [1, 2]
    with pytest.raises(ValueError):
        extract_json("no json here at all")


def test_require_prefix_gate():
    ddl = require_prefix("CREATE TABLE")
    assert ddl("```sql\nCREATE TABLE t (a INT)\n```") == "CREATE TABLE t (a INT)"
    assert ddl("create table t (a int)").startswith("create table")
    with pytest.raises(ValueError):
        ddl("DROP TABLE t")


def test_repair_loop_heals_bad_output():
    calls = []

    def flaky_model(prompt: str) -> str:
        calls.append(prompt)
        if len(calls) == 1:
            return "Sure! Here you go: ```json\n{broken\n```"
        # the repair prompt must carry the bad output and the error
        assert "previous output" in calls[-1].lower()
        assert "{broken" in calls[-1]
        return '{"cols": ["a", "b"]}'

    stage = ExternalModelStage(
        name="AnalyzingSchema",
        model=flaky_model,
        prompt_builder=lambda v: f"analyze: {v}",
        parser=extract_json,
    )
    out = stage("file.csv")
    assert out == {"cols": ["a", "b"]}
    assert len(stage.attempts) == 2
    assert stage.attempts[0].error is not None
    assert stage.attempts[1].error is None


def test_repair_exhaustion_raises_with_last_error():
    stage = ExternalModelStage(
        name="GeneratingSql",
        model=lambda p: "I cannot do that",
        prompt_builder=lambda v: "generate",
        parser=require_prefix("CREATE TABLE"),
        max_repairs=2,
    )
    with pytest.raises(ValueError, match="unusable after 2 repairs"):
        stage("x")
    assert len(stage.attempts) == 3  # initial + 2 repairs, all audited


def test_stage_integrates_with_runner_state_machine():
    def model(prompt: str) -> str:
        if "previous output" in prompt.lower():
            return "CREATE TABLE t (a BIGINT)"
        return "```sql\nSELECT 1\n```"  # violates the DDL contract

    ext = ExternalModelStage(
        name="GeneratingSql",
        model=model,
        prompt_builder=lambda v: f"ddl for {v}",
        parser=require_prefix("CREATE TABLE"),
    )
    pipe = SelfHealingPipeline(spark=None)
    result = pipe.run([ext.as_stage()], initial="t")
    assert result.ok
    assert result.step is PipelineStep.DONE
    assert result.value == "CREATE TABLE t (a BIGINT)"


def test_runner_error_state_on_unhealable_model():
    ext = ExternalModelStage(
        name="GeneratingSql",
        model=lambda p: "garbage",
        prompt_builder=lambda v: "p",
        parser=extract_json,
        max_repairs=1,
    )
    pipe = SelfHealingPipeline(spark=None)
    result = pipe.run([ext.as_stage()], initial=None)
    assert not result.ok
    assert result.step is PipelineStep.ERROR
    assert any(e.severity == "error" for e in result.logs)


def test_extract_json_non_string_raises_value_error():
    with pytest.raises(ValueError, match="not text"):
        extract_json(None)


def test_strip_fences_leaves_mid_line_backticks():
    ddl = "CREATE TABLE t (x INT); -- see ```docs```"
    assert strip_fences(ddl) == ddl


def test_extract_json_pathological_openers_bounded():
    """Degenerate untrusted output (tens of thousands of unmatched
    openers) must fail FAST, not hang O(n^2) (round-8 ADVICE): the
    balanced-substring fallback caps opener attempts and scan length."""
    import time

    bad = "{" * 50_000
    t0 = time.perf_counter()
    with pytest.raises(ValueError):
        extract_json(bad)
    assert time.perf_counter() - t0 < 5.0
    # payload still found when the junk prefix is within the cap
    assert extract_json("{" * 100 + '"x" ' + '{"a": 2}') == {"a": 2}


def test_extract_json_total_scan_budget(monkeypatch):
    """The wall-time bound is the TOTAL scanned-chars budget, not the
    candidate cap alone (round-9 review): with the budget shrunk, a
    long all-opener reply stops after a handful of scans instead of
    running all 256 candidates."""
    import time

    from self_healing_data_pipeline_spark.pipeline import external_stage

    monkeypatch.setattr(external_stage, "_MAX_TOTAL_SCANNED", 200_000)
    bad = "{" * 100_000
    t0 = time.perf_counter()
    with pytest.raises(ValueError):
        external_stage.extract_json(bad)
    # 200k budget / 100k-char scans = ~2 attempts per bracket type;
    # far under the 5s the uncapped 256 attempts would approach
    assert time.perf_counter() - t0 < 2.0


def test_extract_json_payload_ending_past_old_truncation():
    """A payload that STARTS before but ENDS after the old 1 MiB hard
    truncation point must still heal (round-9 review: truncation
    bisected it; the budget form scans full length)."""
    payload = '{"k": "' + "x" * (1 << 20) + '"}'
    assert extract_json("junk " + payload)["k"].startswith("xxx")
