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
