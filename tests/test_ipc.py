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
