"""CI hook for tools/lint_scale.py (round-11 judge task 6): the tree
must stay free of the long-doc quadratic HOF class, and the detector
itself must keep catching the five pre-fix shapes (reverting any
round-10 refit re-creates one of the seeded BAD_FIXTURES)."""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, os.path.join(REPO, "tools"))

import lint_scale  # noqa: E402


def test_tree_is_clean():
    findings = lint_scale.lint_tree()
    assert not findings, (
        "scale-lint findings (dynamic-position substring or computed "
        f"split/sequence inside a HOF lambda): {findings} — refit onto "
        "operators.text.strided_spans / hoist the computation out of the "
        "lambda, or mark an audited exception with '# lint-scale: ok'"
    )


def test_detector_catches_every_seeded_prefix_shape():
    for name, src in lint_scale.BAD_FIXTURES.items():
        assert lint_scale.lint_source(src, name), (
            f"seeded pre-fix fixture {name!r} no longer flagged — the "
            "detector regressed"
        )


def test_detector_keeps_good_shapes_clean():
    for name, src in lint_scale.GOOD_FIXTURES.items():
        assert not lint_scale.lint_source(src, name), (
            f"benign fixture {name!r} flagged — false positive"
        )
