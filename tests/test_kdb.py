"""kdb+ wire-protocol bridge (ext/kdb.py, the raykx analogue):
round-trips against RECORDED kdb wire bytes (composed from the public
IPC format spec), plus a live loopback: our kdb-server shim serving our
kdb client through real sockets."""
import os
import socket
import struct
import threading

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from rayforce_tpu import Runtime                       # noqa: E402
from rayforce_tpu.ext import kdb                       # noqa: E402
from rayforce_tpu.core import types as T, symbols      # noqa: E402
from rayforce_tpu.core.obj import (Obj, list_, dict_, table,  # noqa
                                   string, vec_sym, to_np)
from rayforce_tpu.core.fmt import format_top as fmt    # noqa: E402


# ---- recorded wire bytes (public kdb+ IPC serialization format) ----

def test_recorded_long_vector():
    # q) 0 1 2j  ->  07 00 03000000 + 3x8 LE longs
    wire = bytes([0x07, 0x00]) + struct.pack("<I", 3) + \
        struct.pack("<qqq", 0, 1, 2)
    o = kdb.de_k(wire)
    assert o.t == T.I64 and list(to_np(o)) == [0, 1, 2]
    assert kdb.ser_k(o) == wire


def test_recorded_symbol_atom_and_vector():
    # q) `abc -> f5 'abc' 00
    wire = b"\xf5abc\x00"
    o = kdb.de_k(wire)
    assert o.t == -T.SYMBOL and symbols.name_of(int(o.v)) == "abc"
    assert kdb.ser_k(o) == wire
    # q) `a`bc -> 0b 00 02000000 'a' 00 'bc' 00
    wire = bytes([0x0B, 0x00]) + struct.pack("<I", 2) + b"a\x00bc\x00"
    o = kdb.de_k(wire)
    assert [symbols.name_of(int(s)) for s in to_np(o)] == ["a", "bc"]
    assert kdb.ser_k(o) == wire


def test_recorded_date_atom():
    # q) 2024.01.01 -> f2 (=-14) + LE i32 8766 (days since 2000.01.01)
    wire = b"\xf2" + struct.pack("<i", 8766)
    o = kdb.de_k(wire)
    assert o.t == -T.DATE and int(o.v) == 8766
    assert fmt(o) == "2024.01.01"
    assert kdb.ser_k(o) == wire


def test_recorded_dict():
    # q) `a`b!1 2j
    wire = b"\x63" + \
        bytes([0x0B, 0x00]) + struct.pack("<I", 2) + b"a\x00b\x00" + \
        bytes([0x07, 0x00]) + struct.pack("<I", 2) + \
        struct.pack("<qq", 1, 2)
    o = kdb.de_k(wire)
    assert o.t == T.DICT
    k, v = o.v
    assert [symbols.name_of(int(s)) for s in to_np(k)] == ["a", "b"]
    assert list(to_np(v)) == [1, 2]
    assert kdb.ser_k(o) == wire


def test_recorded_table():
    # q) ([] a: 1 2j)  ->  62 00 63 <`a> <(1 2j)-in-a-list>
    wire = b"\x62\x00\x63" + \
        bytes([0x0B, 0x00]) + struct.pack("<I", 1) + b"a\x00" + \
        bytes([0x00, 0x00]) + struct.pack("<I", 1) + \
        bytes([0x07, 0x00]) + struct.pack("<I", 2) + \
        struct.pack("<qq", 1, 2)
    o = kdb.de_k(wire)
    assert o.t == T.TABLE
    assert len(o) == 2
    assert kdb.ser_k(o) == wire


def test_recorded_char_vector():
    # q) "hi" -> 0a 00 02000000 'h' 'i'
    wire = bytes([0x0A, 0x00]) + struct.pack("<I", 2) + b"hi"
    o = kdb.de_k(wire)
    assert o.t == T.C8
    assert kdb.ser_k(o) == wire


def test_recorded_float_and_bool():
    wire = b"\xf7" + struct.pack("<d", 2.5)       # -9 float atom
    o = kdb.de_k(wire)
    assert o.t == -T.F64 and float(o.v) == 2.5
    assert kdb.ser_k(o) == wire
    wire = bytes([0x01, 0x00]) + struct.pack("<I", 3) + b"\x01\x00\x01"
    o = kdb.de_k(wire)                             # boolean vector
    assert o.t == T.B8 and list(to_np(o)) == [1, 0, 1]
    assert kdb.ser_k(o) == wire


def test_message_header():
    # full sync message for `x: 01 01 00 00 <len> f5 'x' 00
    msg = kdb.pack_msg(Obj(-T.SYMBOL,
                           np.int64(symbols.intern("x"))), 1)
    assert msg[:4] == b"\x01\x01\x00\x00"
    assert struct.unpack("<I", msg[4:8])[0] == len(msg)
    assert msg[8:] == b"\xf5x\x00"


# ---- live loopback: kdb client <-> our kdb-server shim -------------

def test_kdb_loopback():
    srv_rt = Runtime()
    lst = socket.socket()
    lst.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    lst.bind(("127.0.0.1", 0))
    lst.listen(1)
    port = lst.getsockname()[1]

    def serve():
        conn, _ = lst.accept()
        kdb.serve_conn(srv_rt, conn)
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    try:
        cli = Runtime()
        h = cli.eval_str(f'(kopen "127.0.0.1:{port}" "me")')
        r = cli.eval_str(f'(kwrite {int(h.v)} "(+ 1 2)")')
        assert cli.format_result(r) == "3"
        # structured round trip: a table crosses the kdb wire
        cli.eval_str(f'(kwrite {int(h.v)} '
                     '"(set t (table [a] (list [10 20 30])))")')
        r = cli.eval_str(f'(kwrite {int(h.v)} "t")')
        assert r.t == T.TABLE and len(r) == 3
        cli.eval_str(f"(kclose {int(h.v)})")
    finally:
        lst.close()
        t.join(timeout=2)


def test_kdb_compressed_roundtrip():
    """The kdb IPC block compression decodes (reference bridge
    raykx.c:268-333): literal/match control bits over a 256-slot
    adjacent-XOR position table grown from the decoded prefix. The
    compressor here emits the same stream shape, so decompress(compress
    (x)) == x across repetitive, random, and wire-payload inputs; a
    compressed frame round-trips through read_msg."""
    import numpy as np
    from rayforce_tpu.core.obj import Obj
    from rayforce_tpu.core import types as T_
    rng = np.random.default_rng(5)
    samples = [
        b"",
        b"a",
        b"abababababababababab" * 50,
        bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),
        bytes(rng.integers(0, 4, 8192, dtype=np.uint8)),
        kdb.ser_k(Obj(T_.I64, np.arange(5000, dtype=np.int64))),
        kdb.ser_k(Obj(T_.F64, np.zeros(3000))),
    ]
    for raw in samples:
        body = kdb.compress(raw)
        assert kdb.decompress(body) == raw, len(raw)

    # a full compressed MESSAGE through the socket reader
    payload = kdb.ser_k(Obj(T_.I64, np.arange(4000, dtype=np.int64)))
    body = kdb.compress(payload)
    frame = struct.pack("<BBBBI", 1, 2, 1, 0, 8 + len(body)) + body

    class _FakeSock:
        def __init__(self, b):
            self.b = b

        def recv(self, n):
            c, self.b = self.b[:n], self.b[n:]
            return c

    mt, obj = kdb.read_msg(_FakeSock(frame))
    assert mt == 2
    assert (to_np(obj) == np.arange(4000)).all()
