"""Terminal editor + completion tests (reference app/term.c line
editor and env.c:475-547 name enumeration — completion must cover
builtins, globals, AND the columns of loaded tables)."""
import numpy as np

from rayforce_tpu import Runtime
from rayforce_tpu.app.term import LineEditor, completions
from rayforce_tpu.core import symbols, types as T
from rayforce_tpu.core.obj import Obj, table, vec_sym


def _rt_with_table():
    rt = Runtime()
    t = table(vec_sym(["price", "prize", "qty"]),
              [Obj(T.F64, np.zeros(3)),
               Obj(T.F64, np.ones(3)),
               Obj(T.I64, np.arange(3))])
    rt.interp.globals[symbols.intern("trades")] = t
    return rt


# -- completion candidates ----------------------------------------------------

def test_completion_covers_table_columns():
    rt = _rt_with_table()
    cands = completions(rt, "pri")
    assert "price" in cands and "prize" in cands
    assert completions(rt, "qt") == ["qty"]


def test_completion_covers_globals_builtins_keywords():
    rt = _rt_with_table()
    assert "trades" in completions(rt, "tra")
    assert "select" in completions(rt, "sel")
    assert "where:" in completions(rt, "wh")     # query keyword
    assert "where" in completions(rt, "wh")      # builtin too


# -- line editor (injected key stream, no pty) --------------------------------

def _edit(keys, completer=None, history=None):
    """Run one readline over a scripted key sequence; returns
    (submitted line, rendered output)."""
    stream = list(keys)
    outs = []
    ed = LineEditor(completer=completer,
                    read_key=lambda: stream.pop(0) if stream else "",
                    write=outs.append, width=40)
    if history:
        ed.history = list(history)
    line = ed.readline("? ")
    return line, "".join(outs)


def test_basic_insert_and_submit():
    line, _ = _edit("abc\r")
    assert line == "abc"


def test_cursor_moves_and_edit():
    # "abcd", left twice, insert X -> abXcd
    keys = "abcd" + "\x1b[D\x1b[D" + "X" + "\r"
    line, _ = _edit(keys)
    assert line == "abXcd"


def test_home_end_backspace_delete():
    # C-a then delete first char (ESC[3~), C-e then backspace last
    keys = "hello" + "\x01" + "\x1b[3~" + "\x05" + "\x7f" + "\r"
    line, _ = _edit(keys)
    assert line == "ell"


def test_kill_ops():
    line, _ = _edit("foo bar" + "\x17" + "\r")       # C-w kills word
    assert line == "foo "
    line, _ = _edit("foo bar" + "\x01\x0b" + "\r")   # C-a C-k kills all
    assert line == ""
    line, _ = _edit("foo bar" + "\x15" + "zap\r")    # C-u kills line
    assert line == "zap"


def test_word_motion():
    # M-b to word start, insert "X" -> foo Xbar
    keys = "foo bar" + "\x1bb" + "X" + "\r"
    line, _ = _edit(keys)
    assert line == "foo Xbar"


def test_history_up_down():
    line, _ = _edit("\x1b[A\r", history=["one", "two"])
    assert line == "two"
    line, _ = _edit("\x1b[A\x1b[A\r", history=["one", "two"])
    assert line == "one"
    # up then down returns to the line being typed
    line, _ = _edit("new" + "\x1b[A" + "\x1b[B" + "\r",
                    history=["one"])
    assert line == "new"


def test_tab_completion_unique_and_common_prefix():
    rt = _rt_with_table()
    comp = lambda text: completions(rt, text)
    line, _ = _edit("qt\t\r", completer=comp)
    assert line == "qty"
    # pri -> common prefix priz? no: price/prize share "pri"; typing
    # "pric" narrows to unique "price"
    line, _ = _edit("pric\t\r", completer=comp)
    assert line == "price"


def test_tab_completion_lists_ambiguous():
    rt = _rt_with_table()
    comp = lambda text: completions(rt, text)
    line, out = _edit("pri\t\r", completer=comp)
    assert line == "pri"                 # nothing inserted
    assert "price" in out and "prize" in out   # listed instead


def test_ctrl_c_raises():
    import pytest
    with pytest.raises(KeyboardInterrupt):
        _edit("abc\x03")


def test_eof_on_empty_returns_none():
    line, _ = _edit("\x04")
    assert line is None


def test_history_persistence(tmp_path):
    hp = tmp_path / "hist"
    stream = list("one\r")
    ed = LineEditor(history_path=str(hp),
                    read_key=lambda: stream.pop(0) if stream else "",
                    write=lambda s: None)
    assert ed.readline("? ") == "one"
    ed2 = LineEditor(history_path=str(hp), read_key=lambda: "",
                     write=lambda s: None)
    assert ed2.history == ["one"]
