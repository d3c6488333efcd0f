"""IPC round trip: server in a thread, client handle in the same process
(reference examples/ipc.rfl; the wire protocol of core/ipc.c)."""
import threading
import time

import pytest

from rayforce_tpu import Runtime


def test_ipc_roundtrip():
    srv_rt = Runtime()
    from rayforce_tpu.ipc.server import IpcServer
    server = IpcServer(srv_rt, 0, host="127.0.0.1")
    server.start()
    port = server.listener.getsockname()[1]
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            server.run_once(0.05)

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    try:
        cli = Runtime()
        h = cli.eval_str(f'(hopen "127.0.0.1:{port}")')
        r = cli.eval_str(f'(write {int(h.v)} "(+ 1 2)")')
        assert cli.format_result(r) == "3"
        # remote state persists between calls
        cli.eval_str(f'(write {int(h.v)} "(set xx 41)")')
        r = cli.eval_str(f'(write {int(h.v)} "(+ xx 1)")')
        assert cli.format_result(r) == "42"
        # object payloads: send a parsed expression object
        r = cli.eval_str(f'(write {int(h.v)} (parse "(* 6 7)"))')
        assert cli.format_result(r) == "42"
        cli.eval_str(f"(hclose {int(h.v)})")
    finally:
        stop.set()
        t.join(timeout=2)
        server.stop()


def test_zpo_hook():
    srv_rt = Runtime()
    srv_rt.eval_str("(set .z.po (fn [h] (set opened h)))")
    from rayforce_tpu.ipc.server import IpcServer
    server = IpcServer(srv_rt, 0, host="127.0.0.1")
    server.start()
    port = server.listener.getsockname()[1]
    stop = threading.Event()
    t = threading.Thread(target=lambda: [server.run_once(0.05)
                                         for _ in iter(stop.is_set, True)],
                         daemon=True)
    t.start()
    try:
        cli = Runtime()
        h = cli.eval_str(f'(hopen "127.0.0.1:{port}")')
        r = cli.eval_str(f'(write {int(h.v)} "opened")')
        assert cli.format_result(r) == "3"
    finally:
        stop.set()
        t.join(timeout=2)
        server.stop()


def _spin_server(srv_rt, port=0):
    from rayforce_tpu.ipc.server import IpcServer
    server = IpcServer(srv_rt, port, host="127.0.0.1")
    server.start()
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            server.run_once(0.05)

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    return server, server.listener.getsockname()[1], stop, t


def test_async_message():
    """MSG_ASYNC: fire-and-forget evaluation, no response frame
    (ipc.c msgtype async=0)."""
    srv_rt = Runtime()
    server, port, stop, t = _spin_server(srv_rt)
    try:
        cli = Runtime()
        h = int(cli.eval_str(f'(hopen "127.0.0.1:{port}")').v)
        from rayforce_tpu.ipc import client as C
        from rayforce_tpu.core.obj import string
        C.write_async(cli.interp.handles, h, string("(set ax 99)"))
        # the next sync call observes the async effect (ordered pipe)
        r = cli.eval_str(f'(write {h} "ax")')
        assert cli.format_result(r) == "99"
    finally:
        stop.set(); t.join(timeout=2); server.stop()


def test_reentrant_sync_rpc():
    """Two engines sync-calling each other over ONE connection: the
    server's handler sync-calls BACK via (write .z.w ...) while the
    client is blocked in its own (write ...) — the client serves the
    nested request re-entrantly (reference ipc.c:502-524
    poll_block_on)."""
    srv_rt = Runtime()
    server, port, stop, t = _spin_server(srv_rt)
    try:
        cli = Runtime()
        cli.eval_str("(set myval 7)")
        h = int(cli.eval_str(f'(hopen "127.0.0.1:{port}")').v)
        # server evaluates (write .z.w "(+ myval 1)") -> nested sync
        # request to the client -> client evals in ITS engine -> 8
        r = cli.eval_str(
            f'(write {h} "(write .z.w \\"(+ myval 1)\\")")')
        assert cli.format_result(r) == "8"
    finally:
        stop.set(); t.join(timeout=2); server.stop()


def test_zw_saved_restored():
    """.z.w restores after each request (round-1 gap: it leaked)."""
    srv_rt = Runtime()
    server, port, stop, t = _spin_server(srv_rt)
    try:
        cli = Runtime()
        h = int(cli.eval_str(f'(hopen "127.0.0.1:{port}")').v)
        r = cli.eval_str(f'(write {h} ".z.w")')
        assert cli.format_result(r) == "3"
        from rayforce_tpu.core import symbols
        assert symbols.intern(".z.w") not in srv_rt.interp.globals
    finally:
        stop.set(); t.join(timeout=2); server.stop()


def test_partial_frames_do_not_block():
    """A slow client trickling a frame byte-by-byte must not stall the
    reactor: a second, fast client gets served in between (the per-
    connection rx buffers of poll.h:189-219)."""
    import socket as S
    from rayforce_tpu.ipc import protocol as proto
    from rayforce_tpu.core.obj import string
    srv_rt = Runtime()
    server, port, stop, t = _spin_server(srv_rt)
    try:
        slow = S.create_connection(("127.0.0.1", port))
        slow.sendall(bytes([proto.VERSION, 0])); slow.recv(1)
        frame = proto.pack_msg(string("(set slowdone 1)"),
                               proto.MSG_SYNC)
        slow.sendall(frame[:7])       # partial header, stall here

        cli = Runtime()
        h = int(cli.eval_str(f'(hopen "127.0.0.1:{port}")').v)
        r = cli.eval_str(f'(write {h} "(+ 20 22)")')   # fast client OK
        assert cli.format_result(r) == "42"

        slow.sendall(frame[7:])       # complete the slow frame
        deadline = time.time() + 3
        from rayforce_tpu.core import symbols
        while time.time() < deadline:
            if symbols.intern("slowdone") in srv_rt.interp.globals:
                break
            time.sleep(0.02)
        assert symbols.intern("slowdone") in srv_rt.interp.globals
        slow.close()
    finally:
        stop.set(); t.join(timeout=2); server.stop()


def test_two_messages_one_packet():
    """Back-to-back frames in a single TCP segment both process."""
    import socket as S
    from rayforce_tpu.ipc import protocol as proto
    from rayforce_tpu.core.obj import string
    srv_rt = Runtime()
    server, port, stop, t = _spin_server(srv_rt)
    try:
        c = S.create_connection(("127.0.0.1", port))
        c.sendall(bytes([proto.VERSION, 0])); c.recv(1)
        two = proto.pack_msg(string("(set a1 1)"), proto.MSG_ASYNC) + \
            proto.pack_msg(string("(set a2 2)"), proto.MSG_ASYNC)
        c.sendall(two)
        from rayforce_tpu.core import symbols
        deadline = time.time() + 3
        while time.time() < deadline:
            g = srv_rt.interp.globals
            if symbols.intern("a1") in g and symbols.intern("a2") in g:
                break
            time.sleep(0.02)
        g = srv_rt.interp.globals
        assert symbols.intern("a1") in g and symbols.intern("a2") in g
        c.close()
    finally:
        stop.set(); t.join(timeout=2); server.stop()


def test_device_result_over_ipc():
    """A query whose result is DEVICE-RESIDENT (DevPendingSliced
    lanes) must serialize over the wire transparently."""
    import numpy as np
    from rayforce_tpu.engine import device as dev
    srv_rt = Runtime()
    dev.set_threshold(1)
    dev.set_enabled(True)
    try:
        from rayforce_tpu.core.obj import Obj, table, vec_sym
        from rayforce_tpu.core import types as T, symbols
        rng = np.random.default_rng(9)
        n = 4000
        srv_rt.interp.globals[symbols.intern("t")] = table(
            vec_sym(["k", "v"]),
            [Obj(T.I64, rng.integers(0, 700, n).astype(np.int64)),
             Obj(T.I64, rng.integers(0, 50, n).astype(np.int64))])
        server, port, stop, t = _spin_server(srv_rt)
        try:
            cli = Runtime()
            h = int(cli.eval_str(f'(hopen "127.0.0.1:{port}")').v)
            r = cli.eval_str(
                f'(write {h} "(select {{s: (sum v) from: t by: k}})")')
            assert r.t == T.TABLE and 650 < len(r) <= 700
            s = cli.eval_str(f'(write {h} "(sum (at (select '
                             f'{{s: (sum v) from: t by: k}}) \'s))")')
            import numpy as _np
            total = int(_np.sum(
                __import__("rayforce_tpu.core.obj",
                           fromlist=["to_np"]).to_np(
                    srv_rt.interp.globals[symbols.intern("t")]
                    .v[1][1])))
            assert int(s.v) == total
        finally:
            stop.set(); t.join(timeout=2); server.stop()
    finally:
        dev.set_enabled(True)


def test_large_payload_roundtrip():
    """Multi-megabyte vector payloads cross the wire intact in both
    directions (many TCP segments per frame; the rx buffer reassembles
    them; reference ipc.c streams via the same length-prefixed
    header)."""
    import numpy as np
    from rayforce_tpu.core import symbols
    srv_rt = Runtime()
    from rayforce_tpu.ipc.server import IpcServer
    server = IpcServer(srv_rt, 0, host="127.0.0.1")
    server.start()
    port = server.listener.getsockname()[1]
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            server.run_once(0.05)

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    try:
        cli = Runtime()
        h = cli.eval_str(f'(hopen "127.0.0.1:{port}")')
        hv = int(h.v)
        # server -> client: 2M-element vector (16 MB payload)
        r = cli.eval_str(f'(write {hv} "(til 2000000)")')
        arr = r.v
        assert len(arr) == 2_000_000
        assert arr[0] == 0 and int(arr[-1]) == 1_999_999
        assert int(np.asarray(arr).sum()) == 1999999 * 1000000
        # client -> server: ship a large object, aggregate remotely
        cli.eval_str(f'(write {hv} "(set big (til 1500000))")')
        r = cli.eval_str(f'(write {hv} "(sum big)")')
        assert cli.format_result(r) == str(1499999 * 750000)
        cli.eval_str(f"(hclose {hv})")
    finally:
        stop.set()
        t.join(timeout=2)
        server.stop()


def test_many_clients_interleaved():
    """Eight concurrent client handles with interleaved sync RPCs: the
    reactor keeps per-connection rx state isolated (no cross-talk
    between partially-received frames)."""
    srv_rt = Runtime()
    from rayforce_tpu.ipc.server import IpcServer
    server = IpcServer(srv_rt, 0, host="127.0.0.1")
    server.start()
    port = server.listener.getsockname()[1]
    stop = threading.Event()

    def pump():
        while not stop.is_set():
            server.run_once(0.02)

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    try:
        cli = Runtime()
        hs = [int(cli.eval_str(f'(hopen "127.0.0.1:{port}")').v)
              for _ in range(8)]
        for rnd in range(3):
            for i, h in enumerate(hs):
                r = cli.eval_str(f'(write {h} "(+ {i} {rnd * 100})")')
                assert cli.format_result(r) == str(i + rnd * 100)
        for h in hs:
            cli.eval_str(f"(hclose {h})")
    finally:
        stop.set()
        t.join(timeout=2)
        server.stop()
