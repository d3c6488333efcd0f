"""Shared golden-test machinery.

Each golden JSON (tests/golden/*.json) maps case name -> {stmts, expect},
where `expect` was recorded from the reference engine by tools/oracle.py.
A case passes when evaluating the statements in a fresh Runtime and
formatting the final value (single-arg `format` semantics) reproduces the
expected text byte-for-byte; "ERROR:<kind>" goldens expect a RayError of
that kind.
"""
from __future__ import annotations

import json
import os

import pytest

from rayforce_tpu import Runtime
from rayforce_tpu.core.errors import RayError, err_msg

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def load_cases(name):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        golden = json.load(f)
    return [(k, v["stmts"], v["expect"]) for k, v in golden.items()]


def run_case(stmts, expect):
    rt = Runtime()
    try:
        result = None
        for s in stmts:
            result = rt.eval_str(s)
        got = rt.format_result(result)
    except RayError as e:
        got = "ERROR:" + err_msg(e)
    except NotImplementedError as e:
        pytest.skip(f"nyi: {e}")
    assert got == expect, f"got {got!r}, want {expect!r}"


def golden_suite(filename):
    """Decorator-less parametrizer: returns a pytest test function."""
    cases = load_cases(filename)

    @pytest.mark.parametrize("name,stmts,expect", cases,
                             ids=[c[0] for c in cases])
    def test(name, stmts, expect):
        run_case(stmts, expect)

    return test
