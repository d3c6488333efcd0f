"""Cast-matrix goldens, recorded from the reference binary
(tools/oracle.py tests/cases/cast_matrix.json): `as` is a RAW C-style
conversion — lowercase typenames are atom casts, uppercase vector casts,
integer narrowing wraps, NULL sentinels are not special-cased, f64->int
goes through cvtt32/cvtt64 (reference core/rayforce.c cast_obj:2312,
core/compose.c ray_cast_obj:42).

Three recorded cases are excluded: vec_time_to_date / vec_ts_to_date_wrap
/ atom_date_from_ts print through the reference's civil-date renderer,
whose i32 overflow for out-of-range day counts (date.c date_from_i32)
produces non-normalized dates like 21845.01.147 that we do not replicate;
the underlying raw-copy cast is pinned by vec_date_to_i64 etc.
"""
from golden_util import golden_suite

test_cast_matrix = golden_suite("cast_matrix.json")
