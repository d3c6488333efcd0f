"""Operator-semantics goldens, batch 4 — recorded from the reference
binary (tools/oracle.py tests/cases/semantics4.json). Pins temporal
arithmetic (date+time composes a TIMESTAMP; durations sum/bucket in
their own unit; dates only shift), table/dict indexing (at with
negative indices, row-dict results, first/last pass dicts through),
whole-object equality, concat merges (keyed dict merge, table row
append, atom-preserving mixed lists), the `*`/`?`/literal-`[set]`
pattern language of like, string/list ordering, insert/upsert edges,
and scalar formatting.

Not pinned (documented supersets / harness limits): reverse of
dicts/tables and med over NaNs (type errors in the reference,
supported here); show-based cases (stdout, not a value); format-of-
format cases (bare strings escape newlines before the oracle's
unescape); `in` over tables (hangs the reference binary).
"""
from golden_util import golden_suite

test_semantics4 = golden_suite("semantics4.json")
