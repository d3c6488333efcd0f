"""Storage round-trips: serde, vector files, splayed and parted tables."""
import os
import shutil
import tempfile

import numpy as np
import pytest

from rayforce_tpu import Runtime
from rayforce_tpu.ops.cmp import obj_equal


@pytest.fixture
def rt():
    return Runtime()


@pytest.fixture
def tmp(tmp_path):
    return str(tmp_path)


SERDE_CASES = [
    "1", "1.5", "'abc", "\"hello\"", "[1 2 3]", "[1.5 2.5]",
    "[a b c]", "(list 1 2.5 \"x\")", "{a: 1 b: 2}",
    "(table [a b] (list [1 2] [x y]))", "2024.03.20",
    "09:30:00.000", "[true false]", "[0x01 0xff]", "0Nl", "0Ns",
     "null",
]


@pytest.mark.parametrize("src", SERDE_CASES)
def test_serde_roundtrip(rt, src):
    v = rt.eval_str(src)
    rtled = rt.eval_str(f"(de (ser {src}))")
    assert obj_equal(v, rtled), rt.format_result(rtled)


def test_serde_guid(rt):
    rt.eval_str("(set g (guid 3))")
    v = rt.eval_str("g")
    rtled = rt.eval_str("(de (ser g))")
    assert obj_equal(v, rtled)


def test_vector_file_roundtrip(rt, tmp):
    p = os.path.join(tmp, "vec")
    rt.eval_str(f'(set "{p}" [10 20 30])')
    out = rt.eval_str(f'(get "{p}")')
    assert rt.format_result(out) == "[10 20 30]"


def test_symbol_file_roundtrip(rt, tmp):
    p = os.path.join(tmp, "syms")
    rt.eval_str(f'(set "{p}" [aa bb cc])')
    out = rt.eval_str(f'(get "{p}")')
    assert rt.format_result(out) == "[aa bb cc]"


def test_table_file_roundtrip(rt, tmp):
    p = os.path.join(tmp, "tbl")
    rt.eval_str("(set t (table [a b] (list [1 2 3] [1.5 2.5 3.5])))")
    rt.eval_str(f'(set "{p}" t)')
    out = rt.eval_str(f'(get "{p}")')
    assert obj_equal(out, rt.eval_str("t"))


def test_splayed_roundtrip(rt, tmp):
    p = os.path.join(tmp, "spl") + "/"
    rt.eval_str("(set t (table [s v] (list [aa bb aa] [1 2 3])))")
    rt.eval_str(f'(set-splayed "{p}" t)')
    out = rt.eval_str(f'(get-splayed "{p}")')
    # symbol column loads back as an enum over `sym`
    got = rt.eval_str(f'(value (at (get-splayed "{p}") \'s))')
    assert rt.format_result(got) == "[aa bb aa]"
    v = rt.eval_str(f'(at (get-splayed "{p}") \'v)')
    assert rt.format_result(v) == "[1 2 3]"


def test_splayed_select(rt, tmp):
    p = os.path.join(tmp, "spl2") + "/"
    rt.eval_str("(set t (table [s v] (list [aa bb aa] [1 2 3])))")
    rt.eval_str(f'(set-splayed "{p}" t)')
    rt.eval_str(f'(set u (get-splayed "{p}"))')
    out = rt.eval_str("(select {sv: (sum v) from: u by: s})")
    assert "aa" in rt.format_result(out)
    assert rt.format_result(rt.eval_str(
        "(at (select {sv: (sum v) from: u by: s}) 'sv)")) == "[4 2]"


def test_parted_roundtrip(rt, tmp):
    db = os.path.join(tmp, "db")
    for i, day in enumerate(["2024.01.01", "2024.01.02"]):
        rt.eval_str(f"(set t{i} (table [s v] (list [aa bb] "
                    f"[{i*10+1} {i*10+2}])))")
        rt.eval_str(f'(set-parted "{db}" "{day}" "q" t{i})')
    rt.eval_str(f'(set pt (get-parted "{db}" \'q))')
    out = rt.eval_str("(count pt)")
    assert rt.format_result(out) == "4"
    # aggregate over parted columns (streams partitions)
    s = rt.eval_str("(sum (at pt 'v))")
    assert rt.format_result(s) == "26"


def test_csv_roundtrip(rt, tmp):
    p = os.path.join(tmp, "t.csv")
    with open(p, "w") as f:
        f.write("a,b,s\n1,1.5,x\n2,2.5,y\n")
    out = rt.eval_str(f'(read-csv [i64 f64 symbol] "{p}")')
    assert rt.format_result(rt.eval_str(
        f'(at (read-csv [i64 f64 symbol] "{p}") \'a)')) == "[1 2]"
    rt.eval_str(f'(set u (read-csv [i64 f64 symbol] "{p}"))')
    p2 = os.path.join(tmp, "u.csv")
    rt.eval_str(f'(write-csv "{p2}" u)')
    assert open(p2).read().splitlines()[0] == "a,b,s"


def test_large_vector_mmap(rt, tmp):
    """Multi-MB vector file round trip: reads come back via np.memmap
    (zero-copy, the reference's mmap-backed objects rayforce.c:2884)."""
    import numpy as np
    from rayforce_tpu.storage import binary
    from rayforce_tpu.core.obj import Obj, to_np
    from rayforce_tpu.core import types as T
    p = os.path.join(tmp, "big.vec")
    a = np.arange(3_000_000, dtype=np.int64)
    binary.set_path(p, Obj(T.I64, a))
    r = binary.get_path(p)
    b = to_np(r)
    assert isinstance(b, np.memmap) or b.base is not None
    assert len(b) == 3_000_000
    assert b[0] == 0 and b[-1] == 2_999_999
    assert int(b[1_234_567]) == 1_234_567


def test_corrupt_vector_file_errors(rt, tmp):
    from rayforce_tpu.storage import binary
    from rayforce_tpu.core.errors import RayError
    import pytest as _pt
    p = os.path.join(tmp, "bad.vec")
    with open(p, "wb") as f:
        f.write(b"\x00\x01garbage")     # bogus header
    with _pt.raises((RayError, Exception)):
        binary.get_path(p)
    p2 = os.path.join(tmp, "trunc.vec")
    import numpy as np
    from rayforce_tpu.core.obj import Obj
    from rayforce_tpu.core import types as T
    binary.set_path(p2, Obj(T.I64, np.arange(100, dtype=np.int64)))
    with open(p2, "r+b") as f:
        f.truncate(40)                  # body shorter than header says
    with _pt.raises((RayError, Exception)):
        binary.get_path(p2)


def test_parted_schema_mismatch_errors(rt, tmp):
    from rayforce_tpu.core.errors import RayError
    import pytest as _pt
    db = os.path.join(tmp, "baddb")
    rt.eval_str("(set ta (table [x] (list [1 2])))")
    rt.eval_str("(set tb (table [y] (list [3 4])))")
    rt.eval_str(f'(set-parted "{db}" "2024.01.01" "q" ta)')
    rt.eval_str(f'(set-parted "{db}" "2024.01.02" "q" tb)')
    with _pt.raises(RayError):
        rt.eval_str(f'(set pt (get-parted "{db}" \'q))')


def test_splayed_sym_reenumeration_merge(rt, tmp):
    """Writing a second splayed table against a PRE-EXISTING shared sym
    file must MERGE domains (existing ids keep their positions; new
    symbols append — io.c:1230-1260), so earlier enum columns stay
    valid."""
    from rayforce_tpu.storage import binary
    from rayforce_tpu.core.obj import to_np
    from rayforce_tpu.core import symbols as S
    db = os.path.join(tmp, "sdb")
    os.makedirs(db)
    symf = os.path.join(db, "sym")
    rt.eval_str("(set t1 (table [s] (list [aa bb])))")
    rt.eval_str("(set t2 (table [s] (list [cc bb dd])))")
    from rayforce_tpu.storage import splayed
    splayed.set_splayed(os.path.join(db, "p1"), 
                        rt.interp.globals[S.intern("t1")],
                        symfile=symf, interp=rt.interp)
    dom1 = [S.name_of(int(x)) for x in to_np(binary.get_path(symf))]
    splayed.set_splayed(os.path.join(db, "p2"),
                        rt.interp.globals[S.intern("t2")],
                        symfile=symf, interp=rt.interp)
    dom2 = [S.name_of(int(x)) for x in to_np(binary.get_path(symf))]
    assert dom2[:len(dom1)] == dom1          # old ids preserved
    assert set(dom2) >= {"aa", "bb", "cc", "dd"}
    # earlier partition still reads correctly after the merge
    r1 = splayed.get_splayed(os.path.join(db, "p1"), interp=rt.interp)
    col = r1.v[1][0]
    from rayforce_tpu.core.fmt import format_top as fmt2
    assert "aa" in fmt2(col) and "bb" in fmt2(col)


# ---- quoted CSV through the NATIVE parallel path (io.c:491-505) ----

def _native_available():
    from rayforce_tpu.storage.native import lib
    return lib() is not None


QUOTED_CSV = (
    "i,f,s,c\n"                       # header
    '1,"1.5","a,b","x,y"\n'           # separators inside quotes
    '"2",2.5,plain,""\n'              # quoted int; quoted empty C8
    '"-3","","q""tail",zz\n'          # quoted empty f64 -> 0.0 (span,
    "4,4.5,sym,\n"                    #  not null); unquoted empty last
)                                     #  field -> missing


def test_csv_quoted_native_path(rt, tmp):
    """Quoted fixtures must parse through the PARALLEL native path
    (no Python fallback) and agree with the Python reference parser
    field-for-field (reference quote rule io.c:491-505: field starting
    with '\"' runs to the next '\"', no doubled-quote escapes)."""
    if not _native_available():
        pytest.skip("native lib unavailable")
    from rayforce_tpu.storage import csv as csvmod
    p = os.path.join(tmp, "q.csv")
    with open(p, "w") as f:
        f.write(QUOTED_CSV)
    out = rt.eval_str(f'(read-csv [i64 f64 symbol c8] "{p}")')
    assert csvmod.last_engine == "native", csvmod.last_engine
    native_fmt = rt.format_result(out)
    # force the Python parser and compare formatted output
    import rayforce_tpu.storage.csv as C
    orig = C._read_csv_native
    C._read_csv_native = lambda *a, **k: None
    try:
        out2 = rt.eval_str(f'(read-csv [i64 f64 symbol c8] "{p}")')
        assert csvmod.last_engine == "python"
    finally:
        C._read_csv_native = orig
    assert native_fmt == rt.format_result(out2)
    # spot-check the pinned semantics
    assert rt.format_result(rt.eval_str(
        f'(at (read-csv [i64 f64 symbol c8] "{p}") \'i)')) \
        == "[1 2 -3 4]"
    # quoted empty f64 is a zero-length SPAN (0.0), not a null
    f = rt.eval_str(f'(at (read-csv [i64 f64 symbol c8] "{p}") \'f)')
    assert rt.format_result(f) == "[1.50 2.50 0.00 4.50]"


def test_csv_quoted_native_temporal(rt, tmp):
    """Quoted date/time/timestamp fields ride the native path."""
    if not _native_available():
        pytest.skip("native lib unavailable")
    from rayforce_tpu.storage import csv as csvmod
    p = os.path.join(tmp, "qt.csv")
    with open(p, "w") as f:
        f.write('d,t,ts\n"2024.03.20","09:30:00.000",'
                '"2024-03-20T09:30:00"\n'
                '2024.03.21,10:00:00.000,2024-03-21T10:00:00\n')
    out = rt.eval_str(f'(read-csv [date time timestamp] "{p}")')
    assert csvmod.last_engine == "native"
    s = rt.format_result(out)
    assert "2024.03.20" in s and "2024.03.21" in s
    assert "09:30:00.000" in s


def test_csv_unterminated_quote_errors(rt, tmp):
    """Unterminated quote = err_length (io.c:496-499) on BOTH paths;
    the native scanner detects it via rf_min_fields -1."""
    from rayforce_tpu.core.errors import RayError
    p = os.path.join(tmp, "bad.csv")
    with open(p, "w") as f:
        f.write('a,b\n1,"oops\n2,3\n')
    with pytest.raises(RayError):
        rt.eval_str(f'(read-csv [i64 i64] "{p}")')


def test_csv_quoted_not_ragged(rt, tmp):
    """Separators inside quotes must not trip the ragged-line gate
    (quote-aware rf_min_fields)."""
    if not _native_available():
        pytest.skip("native lib unavailable")
    from rayforce_tpu.storage import csv as csvmod
    p = os.path.join(tmp, "qr.csv")
    with open(p, "w") as f:
        f.write('a,s\n1,"x,y,z,w"\n2,plain\n')
    out = rt.eval_str(f'(read-csv [i64 symbol] "{p}")')
    assert csvmod.last_engine == "native"
    assert rt.format_result(rt.eval_str(
        f'(at (read-csv [i64 symbol] "{p}") \'a)')) == "[1 2]"
