"""Parted-DB goldens recorded from the reference binary (per-partition
set-splayed dirs + get-parted, the reference's own idiom from
examples/parted.rfl; loader core/vary.c:185-391).

Scope note: the reference's parted QUERY surface is narrow — grouping
or filtering by a non-parted column, `take` on a parted table, and the
virtual column in `where:` all raise type errors there (probed live;
its MAPCOMMON group index only covers the parted column itself,
core/index.c:2199). Ours supports those as a superset, so only the
shapes the reference actually answers are pinned here. Integer-named
partition dirs also diverge deliberately: the reference casts EVERY
dir name to DATE (vary.c:221 cast_obj(TYPE_DATE, dirs) — "0" becomes
2000.01.01), while we surface a true integer `Id` virtual column;
ours is covered by tests/test_storage.py instead."""
from golden_util import golden_suite

test_parted_oracle = golden_suite("parted_oracle.json")
