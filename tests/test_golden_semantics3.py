"""Operator-semantics goldens, batch 3 — recorded from the reference
binary (tools/oracle.py tests/cases/semantics3.json). Pins the
long-tail builtin surface: row, null-aware comparisons, set ops with
duplicates (sect keeps the left side's dups), binr lower-bound tail,
eager elementwise and/or (no short-circuit — logic.c logic_map),
raise's string-or-error contract, neg over booleans, raze unification,
take over dicts, distinct/group orderings, iterator/arity edges,
ser/de round-trips, and like/within/xbar shapes.

Intentionally NOT pinned (documented supersets / reference defects):
reference crashes (remove/diverse/unify on these list shapes,
fold-left), the unregistered set-fpr builtin, `return` (a no-op
identity in the reference binary; ours exits the lambda), f64 `within`
and symbol `like` (type errors there, supported here), `distinct` over
NaNs (nyi there) and over LISTs (C hash-table iteration order), and
`round` of ints (reinterprets the bit pattern there).
"""
from golden_util import golden_suite

test_semantics3 = golden_suite("semantics3.json")
