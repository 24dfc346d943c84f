"""Native C++ tuning server (hserver parity) driven by the Python client —
cross-language protocol validation."""

import json
import urllib.request

import pytest

engine_cpp = pytest.importorskip("offt_tpu.tune.engine_cpp")

if not engine_cpp.available():
    pytest.skip("no native toolchain", allow_module_level=True)

from offt_tpu.tune.client import ServiceClient
from offt_tpu.tune.synth import ah_quadratic


@pytest.fixture()
def native_server():
    proc, port = engine_cpp.spawn_server()
    yield port
    proc.kill()
    proc.wait()


def test_native_nm_session(native_server):
    with ServiceClient("127.0.0.1", native_server) as c:
        dims = [(f"v{i}", list(range(1, 101))) for i in range(6)]
        c.create_session(dims, strategy="nm", seed=2)
        best = float("inf")
        for _ in range(300):
            pt = c.generate()
            if pt is None:
                break
            perf = ah_quadratic([p + 1 for p in pt])
            best = min(best, perf)
            c.analyze(pt, perf)
            if c.converged():
                break
        assert best <= 400
        assert c.best() is not None


def test_native_http_monitor(native_server):
    with ServiceClient("127.0.0.1", native_server) as c:
        c.create_session([("x", list(range(8)))], strategy="random",
                         name="probe")
        pt = c.generate()
        c.analyze(pt, 1.0)
    api = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{native_server}/api/sessions", timeout=5).read())
    assert api and api[0]["name"] == "probe" and api[0]["trials"] == 1
    page = urllib.request.urlopen(
        f"http://127.0.0.1:{native_server}/", timeout=5).read().decode()
    assert "probe" in page


def test_native_server_bad_input(native_server):
    import socket

    with socket.create_connection(("127.0.0.1", native_server), 5) as s:
        fh = s.makefile("rwb")
        fh.write(b'{"op": "fetch", "session": 42}\n')
        fh.flush()
        assert json.loads(fh.readline())["status"] == "FAIL"
        fh.write(b'{"op": "session", "dims": []}\n')
        fh.flush()
        assert json.loads(fh.readline())["status"] == "FAIL"
        fh.write(b"garbage\n")
        fh.flush()
        assert json.loads(fh.readline())["status"] == "FAIL"


def test_two_sessions_isolated(native_server):
    with ServiceClient("127.0.0.1", native_server) as c1, \
         ServiceClient("127.0.0.1", native_server) as c2:
        s1 = c1.create_session([("a", list(range(5)))], strategy="brute")
        s2 = c2.create_session([("b", list(range(7)))], strategy="brute")
        assert s1 != s2
        p1 = c1.generate()
        p2 = c2.generate()
        assert len(p1) == 1 and len(p2) == 1
        c1.analyze(p1, 1.0)
        c2.analyze(p2, 2.0)
        assert c1.best() == list(p1)
        assert c2.best() == list(p2)


def test_native_live_session_api(native_server):
    """Native /api/session/<id>?since=N incremental stream + live page."""
    with ServiceClient("127.0.0.1", native_server) as c:
        c.create_session([("x", list(range(10)))], strategy="random",
                         name="live-native")
        p1 = c.generate()
        c.analyze(p1, 2.5)
        base = f"http://127.0.0.1:{native_server}"
        j = json.loads(urllib.request.urlopen(
            base + "/api/session/1", timeout=5).read())
        assert j["total"] == 1 and len(j["trials"]) == 1
        assert j["trials"][0][2] == 2.5
        j2 = json.loads(urllib.request.urlopen(
            base + "/api/session/1?since=1", timeout=5).read())
        assert j2["trials"] == []
        p2 = c.generate()
        c.analyze(p2, 0.25)
        j3 = json.loads(urllib.request.urlopen(
            base + "/api/session/1?since=1", timeout=5).read())
        assert len(j3["trials"]) == 1 and j3["trials"][0][2] == 0.25
        assert j3["best"]["perf"] == 0.25
        page = urllib.request.urlopen(
            base + "/session/1", timeout=5).read().decode()
        assert "/api/session/" in page and "setTimeout(tick" in page
        try:
            urllib.request.urlopen(base + "/api/session/99", timeout=5)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404


def test_native_query_inform_cfg(native_server):
    """getcfg/setcfg over the native server — harmony_query/inform parity."""
    with ServiceClient("127.0.0.1", native_server) as c:
        c.create_session([("x", list(range(10)))], strategy="random",
                         name="cfg-native", seed=7)
        assert c.query("SESSION_STRATEGY") == "random"
        assert c.query("RANDOM_SEED") == "7"
        assert c.query("NOPE") is None
        assert c.inform("PREFETCH_COUNT", 3) is None
        assert c.query("PREFETCH_COUNT") == "3"
        assert c.inform("PREFETCH_COUNT", "5") == "3"
        assert c.inform("PREFETCH_COUNT", None) == "5"
        assert c.query("PREFETCH_COUNT") is None
        assert c.query("STRATEGY_CONVERGED") in ("0", "1")
        c.inform("PAUSED", 1)
        r = c._rpc(op="fetch", session=c.session)
        assert r["status"] == "BUSY" and r["reason"] == "paused"
        c.inform("PAUSED", None)
        assert c.generate() is not None


def test_native_pause_resumes_search(native_server):
    """Python-server parity: a pause suspends generate() without ending
    the search."""
    import threading
    import time as _time

    with ServiceClient("127.0.0.1", native_server,
                       pause_poll_s=0.05) as c:
        sid = c.create_session([("x", list(range(10)))], strategy="random",
                               name="pause-native")
        with ServiceClient("127.0.0.1", native_server) as admin:
            admin.join(sid)
            admin.inform("PAUSED", 1)
            got = []
            th = threading.Thread(target=lambda: got.append(c.generate()),
                                  daemon=True)
            th.start()
            _time.sleep(0.3)
            assert got == []
            admin.inform("PAUSED", None)
            th.join(5.0)
            assert got and got[0] is not None


def test_native_cfg_seeded_at_create(native_server):
    """The session descriptor's cfg dict seeds runtime config (Python-
    server parity: Session(..., cfg=msg.get('cfg')))."""
    import socket

    with socket.create_connection(("127.0.0.1", native_server), 5) as s:
        fh = s.makefile("rwb")
        fh.write((json.dumps({
            "op": "session", "name": "seeded-native",
            "dims": [{"name": "x", "values": [0, 1, 2]}],
            "strategy": "random",
            "cfg": {"NM_REFLECT_COEFFICIENT": "1.5"}}) + "\n").encode())
        fh.flush()
        sid = json.loads(fh.readline())["session"]
        fh.write((json.dumps({"op": "getcfg", "session": sid,
                              "key": "NM_REFLECT_COEFFICIENT"})
                  + "\n").encode())
        fh.flush()
        assert json.loads(fh.readline())["value"] == "1.5"


def test_native_cfg_value_escaping(native_server):
    """Escaped JSON strings (quotes, backslashes, \\uXXXX non-ASCII)
    round-trip through the native server identically to the Python one."""
    with ServiceClient("127.0.0.1", native_server) as c:
        c.create_session([("x", list(range(3)))], strategy="random",
                         name="esc-native")
        assert c.inform("NOTE", 'say "hi"\\done') is None
        assert c.query("NOTE") == 'say "hi"\\done'
        c.inform("UNI", "µ-tab\tend")
        assert c.query("UNI") == "µ-tab\tend"


def test_native_session_api_exposes_cfg(native_server):
    with ServiceClient("127.0.0.1", native_server) as c:
        c.create_session([("x", list(range(5)))], strategy="random",
                         name="cfgview")
        c.inform("PREFETCH_COUNT", 2)
        j = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{native_server}/api/session/1",
            timeout=5).read())
        assert j["cfg"]["PREFETCH_COUNT"] == "2"
        assert j["cfg"]["SESSION_STRATEGY"] == "random"
