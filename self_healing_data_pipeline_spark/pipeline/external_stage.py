"""Pluggable EXTERNAL-MODEL stage for the self-healing pipeline — the
generic adapter for the reference's LLM channel
(``APP/services/geminiService.ts``): call an external text-producing
service inside a pipeline stage, then HEAL its output with the same
fallback chain the reference applies to Gemini responses:

- fence stripping — the reference unwraps ```json ... ``` fences
  before parsing (``geminiService.ts:28-47``);
- re-parse fallback — on JSON parse failure, extract the first
  balanced object/array substring and parse that (same lines);
- output-contract checks — e.g. the generated-SQL path requires the
  text to start with CREATE TABLE (``geminiService.ts:131-140``);
- REPAIR loop — on a parse/contract failure the model is re-invoked
  with a repair prompt carrying the previous output and the error,
  up to ``max_repairs`` times, before the stage's own retry/backoff
  (``pipeline/runner.py``) takes over.

The model is ANY ``Callable[[str], str]`` — a real deployment plugs an
HTTP client here; tests (and the public-knowledge constraint of this
repo) plug deterministic fakes. Everything around the callable — the
healing chain, audit trail of attempts, integration with Stage/
ReviewGate — is real and tested (``tests/test_external_stage.py``).
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from self_healing_data_pipeline_spark.pipeline.runner import Stage

# Fence lines only (line-anchored on BOTH sides): a ``` that ends a
# content line is literal text, not a fence — stripping it would
# mutate valid unfenced output.
_FENCE_RE = re.compile(r"^```[a-zA-Z0-9_-]*[ \t]*\n?|^```[ \t]*$",
                       re.MULTILINE)

# Bounds for the balanced-substring fallback scan over UNTRUSTED model
# output (see extract_json): without them a degenerate reply of many
# unmatched openers makes the fallback quadratic. The WALL-TIME bound
# is the total-scanned-chars budget — a candidate cap alone still
# permits candidates × reply_len character work (review finding), and
# a hard prefix truncation alone bisects a payload that merely ENDS
# past the cut (review finding) — so the budget is spent on actual
# scan work and the first candidates always get a full-length scan.
_MAX_SCAN_CHARS = 8 << 20  # hard cap: replies past 8 MiB are truncated
_MAX_CANDIDATES = 256  # opener occurrences attempted per bracket type
_MAX_TOTAL_SCANNED = 32 << 20  # chars of balance-scan work per call


def strip_fences(text: str) -> str:
    """Remove markdown code fences (```json / ```sql / bare ```) — the
    reference's first unwrap step before parsing model output."""
    return _FENCE_RE.sub("", text).strip()


def extract_json(text: str) -> Any:
    """Parse model output as JSON with the reference's fallback chain:
    direct parse → fence-stripped parse → first balanced {...} or
    [...] substring. Raises ``ValueError`` with the underlying parse
    error when every fallback fails (including non-string model output
    — a broken HTTP client returning None is exactly what the healing
    loop must absorb, so it must surface as the documented ValueError,
    not a raw TypeError from the regex engine)."""
    if not isinstance(text, str):
        raise ValueError(
            f"model output is not text: {type(text).__name__}"
        )
    for candidate in (text, strip_fences(text)):
        try:
            return json.loads(candidate)
        except (json.JSONDecodeError, TypeError):
            pass
    stripped = strip_fences(text)
    # Untrusted-output bounds (round-8 ADVICE + round-9 review): each
    # opener occurrence costs an O(n) balance scan, so degenerate
    # output (tens of thousands of unmatched '{') is O(n^2) — a
    # practical hang. Three bounds: a hard 8 MiB cap on the scanned
    # text (a reply that size is pathological; direct and
    # fence-stripped parses above still see the full text), at most
    # _MAX_CANDIDATES opener attempts per bracket type, and a TOTAL
    # scanned-chars budget shared by all attempts — the actual
    # wall-time bound. A payload that merely ENDS past 1 MiB (the old
    # truncation point) heals fine now: the first candidate always
    # gets a full-length scan out of the budget.
    if len(stripped) > _MAX_SCAN_CHARS:
        stripped = stripped[:_MAX_SCAN_CHARS]
    budget = _MAX_TOTAL_SCANNED
    for opener, closer in (("{", "}"), ("[", "]")):
        # Try opener occurrences in order, not just the first: a
        # preamble like ``note {not json} then {"a": 1}`` has a
        # balanced-but-invalid first candidate, and the valid payload
        # comes later.
        attempts = 0
        start = stripped.find(opener)
        while start >= 0 and attempts < _MAX_CANDIDATES and budget > 0:
            attempts += 1
            depth = 0
            in_str = False
            esc = False
            i = start - 1
            for i in range(start, len(stripped)):
                ch = stripped[i]
                if in_str:
                    if esc:
                        esc = False
                    elif ch == "\\":
                        esc = True
                    elif ch == '"':
                        in_str = False
                    continue
                if ch == '"':
                    in_str = True
                elif ch == opener:
                    depth += 1
                elif ch == closer:
                    depth -= 1
                    if depth == 0:
                        try:
                            return json.loads(stripped[start : i + 1])
                        except json.JSONDecodeError:
                            break
            budget -= i - start + 1
            start = stripped.find(opener, start + 1)
    raise ValueError(f"no parseable JSON in model output: {text[:80]!r}")


def require_prefix(prefix: str) -> Callable[[str], str]:
    """Contract check factory: the cleaned output must start with
    ``prefix`` (case-insensitive) — the reference's CREATE TABLE gate.
    Returns the cleaned text; raises ``ValueError`` otherwise."""

    def check(text: str) -> str:
        cleaned = strip_fences(text)
        if not cleaned.lower().startswith(prefix.lower()):
            raise ValueError(
                f"output must start with {prefix!r}, got: {cleaned[:60]!r}"
            )
        return cleaned

    return check


@dataclass
class ModelAttempt:
    """Audit record of one model invocation inside the healing loop."""

    prompt: str
    raw_output: str
    error: str | None  # None = parsed/validated clean


@dataclass
class ExternalModelStage:
    """A pipeline ``Stage`` whose work is an external model call with
    output healing.

    - ``model``: the external service, ``prompt -> raw text``.
    - ``prompt_builder``: stage input -> initial prompt.
    - ``parser``: raw text -> stage output; raise to trigger repair
      (e.g. :func:`extract_json`, :func:`require_prefix`, or any
      domain parser).
    - ``repair_prompt``: (original prompt, bad output, error) -> the
      re-ask. Default wraps the reference's "fix your output" shape.
    - ``max_repairs``: model re-invocations per stage attempt; the
      runner's own ``retries``/backoff then wrap the whole loop.

    ``attempts`` accumulates an audit trail across invocations — the
    log a production pipeline ships to its catalog for model-call
    observability.
    """

    name: str
    model: Callable[[str], str]
    prompt_builder: Callable[[Any], str]
    parser: Callable[[str], Any]
    repair_prompt: Callable[[str, str, str], str] | None = None
    max_repairs: int = 2
    attempts: list[ModelAttempt] = field(default_factory=list)

    def _repair(self, prompt: str, bad: str, err: str) -> str:
        if self.repair_prompt is not None:
            return self.repair_prompt(prompt, bad, err)
        return (
            f"{prompt}\n\nYour previous output could not be used "
            f"({err}). Previous output:\n{bad}\n"
            "Return ONLY the corrected output, no prose, no fences."
        )

    def __call__(self, value: Any) -> Any:
        prompt = self.prompt_builder(value)
        last_err = "model never invoked"
        for _ in range(self.max_repairs + 1):
            raw = self.model(prompt)
            try:
                parsed = self.parser(raw)
            except Exception as exc:  # heal: re-ask with the error
                last_err = str(exc)
                self.attempts.append(ModelAttempt(prompt, raw, last_err))
                prompt = self._repair(prompt, raw, last_err)
                continue
            self.attempts.append(ModelAttempt(prompt, raw, None))
            return parsed
        raise ValueError(
            f"{self.name}: model output unusable after "
            f"{self.max_repairs} repairs: {last_err}"
        )

    def as_stage(
        self,
        validate: Callable[[Any], bool] | None = None,
        retries: int = 0,
        backoff_sec: float = 0.5,
    ) -> Stage:
        """Wrap as a runner ``Stage`` (retry/backoff compose OUTSIDE the
        repair loop: repairs re-ask the model about its output; retries
        re-run the whole call for transient transport failures)."""
        return Stage(
            name=self.name,
            fn=self,
            validate=validate,
            retries=retries,
            backoff_sec=backoff_sec,
        )
