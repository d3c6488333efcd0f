"""Documented divergences from the reference (deliberate extensions).

The reference returns 0Nf for grouped med/dev (its FN_AGGR med/dev
never learned the MAPGROUP contract) and CRASHES on a window-join row
whose window matches nothing; this engine implements both properly.
These tests pin OUR behavior (not oracle goldens).
"""
import os

from rayforce_tpu import Runtime
from rayforce_tpu.core.fmt import format_top as fmt


def run(*stmts):
    rt = Runtime()
    r = None
    for s in stmts:
        r = rt.eval_str(s)
    return fmt(r)


def test_grouped_med():
    out = run("(set t (table [g v] (list [a a a b b] [5 1 3 2 4])))",
              "(at (select {m: (med v) from: t by: g}) 'm)")
    assert out == "[3.00 3.00]"


def test_grouped_med_even_interpolates():
    out = run("(set t (table [g v] (list [a a a a] [4 1 3 2])))",
              "(at (select {m: (med v) from: t by: g}) 'm)")
    assert out == "[2.50]"


def test_grouped_med_skips_nulls():
    out = run("(set t (table [g v] (list [a a a] [1 0Nl 3])))",
              "(at (select {m: (med v) from: t by: g}) 'm)")
    assert out == "[2.00]"


def test_grouped_dev():
    out = run("(set t (table [g v] (list [a a a b] [1 2 3 5])))",
              "(at (select {d: (dev v) from: t by: g}) 'd)")
    assert out == "[0.82 0.00]"


def test_window_join_empty_window_is_sane():
    out = run(
        "(set l (table [s ts] (list [a] [05:00:00.000])))",
        "(set r (table [s ts p] (list [a] [09:00:00.000] [1.0])))",
        "(at (window-join [s ts] (map-left + [-1000 1000] (at l 'ts)) "
        "l r {c: (count p)}) 'c)")
    assert out == "[0]"


def test_c_abi_plugin(tmp_path):
    """Real C shared-library plugin through the rf_vec ABI
    (native/rayforce_plugin.h; the reference's dynlib surface)."""
    import shutil
    import subprocess
    if shutil.which("cc") is None and shutil.which("gcc") is None:
        import pytest
        pytest.skip("no C compiler")
    cc = shutil.which("cc") or shutil.which("gcc")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, "native", "example_plugin.c")
    so = str(tmp_path / "example_plugin.so")
    subprocess.run([cc, "-shared", "-fPIC", "-O2", src, "-o", so,
                    "-I", os.path.join(root, "native")], check=True)
    from rayforce_tpu import Runtime
    rt = Runtime()
    rt.eval_str(f'(set vsum (loadfn "{so}" \'rf_vsum 1))')
    assert rt.format_result(rt.eval_str("(vsum [1 2 3 40])")) == "46"
    rt.eval_str(f'(set saxpy (loadfn "{so}" \'rf_saxpy 3))')
    r = rt.eval_str("(saxpy 2.0 [1.0 2.0] [10.0 20.0])")
    assert rt.format_result(r) == "[12.00 24.00]"
