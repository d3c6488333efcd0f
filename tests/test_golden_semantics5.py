"""Query-shape goldens, batch 5 — recorded from the reference binary
(tools/oracle.py tests/cases/semantics5.json). Pins select shapes
(bare/take/derived-by/multi-key/empty-result/null aggregates), update
(copy-on-write, broadcast-by, new columns, global write-back), insert
(dict reorder, missing columns fill nulls, NAMED insert/upsert return
the target symbol), joins (left/inner/asof/window over 1-2 keys, null
fills, right-dup last-wins), and nested selects.

Not pinned (documented supersets): grouped `med` (returns typed nulls
in the reference binary — ours computes the real median, same class as
the window-join med/dev probe in test_golden_wjoin), and grouping by a
plain DATE column (a type error there; ours groups it — the parted
virtual Date column requires it anyway).
"""
from golden_util import golden_suite

test_semantics5 = golden_suite("semantics5.json")
