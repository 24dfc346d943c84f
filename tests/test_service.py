"""Tuning service + client: multi-process tuning parity (hserver/hclient,
SURVEY.md §4.5 'any number of clients on localhost exercise the protocol')."""

import json
import socket
import urllib.request

import pytest

from offt_tpu.tune.client import ServiceClient
from offt_tpu.tune.service import TuningServer
from offt_tpu.tune.synth import ah_quadratic


@pytest.fixture()
def server():
    srv = TuningServer(port=0)  # ephemeral port
    srv.start_background()
    yield srv
    srv.shutdown()


def test_session_tuning_loop(server):
    with ServiceClient(server.host, server.port) as c:
        dims = [(f"v{i}", list(range(1, 101))) for i in range(6)]
        c.create_session(dims, strategy="nm", seed=2)
        best_perf = float("inf")
        for _ in range(300):
            pt = c.generate()
            if pt is None:
                break
            vals = [pt[i] + 1 for i in range(6)]  # index -> value (lo=1)
            perf = ah_quadratic(vals)
            best_perf = min(best_perf, perf)
            c.analyze(pt, perf)
            if c.converged():
                break
        assert best_perf <= 100
        assert c.best() is not None


def test_two_clients_one_session(server):
    with ServiceClient(server.host, server.port) as c1:
        sid = c1.create_session([("x", list(range(10)))], strategy="random")
        with ServiceClient(server.host, server.port) as c2:
            c2.join(sid)
            p1 = c1.generate()
            p2 = c2.generate()
            c1.analyze(p1, 1.0)
            c2.analyze(p2, 2.0)
            assert c2.best() is not None


def test_http_monitor_same_port(server):
    with ServiceClient(server.host, server.port) as c:
        c.create_session([("x", list(range(10)))], strategy="random",
                         name="demo")
        pt = c.generate()
        c.analyze(pt, 3.14)
    base = f"http://{server.host}:{server.port}"
    overview = urllib.request.urlopen(base + "/", timeout=10).read().decode()
    assert "demo" in overview
    api = json.loads(urllib.request.urlopen(
        base + "/api/sessions", timeout=10).read())
    assert api and api[0]["trials"] == 1
    page = urllib.request.urlopen(
        base + f"/api/sessions", timeout=10).read()
    sess_page = urllib.request.urlopen(
        base + "/session/1", timeout=10).read().decode()
    assert "svg" in sess_page


def test_bad_request_fails_cleanly(server):
    with socket.create_connection((server.host, server.port), timeout=10) as s:
        fh = s.makefile("rwb")
        fh.write(b'{"op": "fetch", "session": 999}\n')
        fh.flush()
        reply = json.loads(fh.readline())
        assert reply["status"] == "FAIL"
        fh.write(b"not json at all\n")
        fh.flush()
        reply = json.loads(fh.readline())
        assert reply["status"] == "FAIL"


def test_live_session_api_incremental(server):
    """/api/session/<id>?since=N streams only new trials — the live
    monitor's polling endpoint (httpsvr.c:62-77 refresh-loop analogue)."""
    with ServiceClient(server.host, server.port) as c:
        c.create_session([("x", list(range(10)))], strategy="random",
                         name="live")
        p1 = c.generate()
        c.analyze(p1, 1.5)
        base = f"http://{server.host}:{server.port}"
        j = json.loads(urllib.request.urlopen(
            base + "/api/session/1", timeout=10).read())
        assert j["total"] == 1 and len(j["trials"]) == 1
        assert j["trials"][0][2] == 1.5
        # incremental: since=1 returns nothing new yet
        j2 = json.loads(urllib.request.urlopen(
            base + "/api/session/1?since=1", timeout=10).read())
        assert j2["trials"] == [] and j2["total"] == 1
        p2 = c.generate()
        c.analyze(p2, 0.5)
        j3 = json.loads(urllib.request.urlopen(
            base + "/api/session/1?since=1", timeout=10).read())
        assert len(j3["trials"]) == 1 and j3["trials"][0][2] == 0.5
        assert j3["best"]["perf"] == 0.5
        # the page embeds the polling script
        page = urllib.request.urlopen(
            base + "/session/1", timeout=10).read().decode()
        assert "/api/session/" in page and "setTimeout(tick" in page
    # unknown session -> 404
    try:
        urllib.request.urlopen(base + "/api/session/99", timeout=10)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_query_inform_cfg(server):
    """Session runtime config: harmony_query/harmony_inform parity
    (hclient.h:95-128, session-core.c:927-935)."""
    with ServiceClient(server.host, server.port) as c:
        c.create_session([("x", list(range(10)))], strategy="random",
                         name="cfg")
        # seeded keys from the session descriptor
        assert c.query("SESSION_STRATEGY") == "random"
        assert c.query("RANDOM_SEED") == "0"
        assert c.query("NOPE") is None
        # inform returns the ORIGINAL value (hclient.h:115-117)
        assert c.inform("PREFETCH_COUNT", 3) is None
        assert c.query("PREFETCH_COUNT") == "3"
        assert c.inform("PREFETCH_COUNT", "5") == "3"
        # val=None erases the key
        assert c.inform("PREFETCH_COUNT", None) == "5"
        assert c.query("PREFETCH_COUNT") is None
        # live key: STRATEGY_CONVERGED reflects strategy state
        assert c.query("STRATEGY_CONVERGED") in ("0", "1")
        # live key: PAUSED makes fetch return BUSY with reason "paused"
        # (temporary — distinct from strategy exhaustion, which is final)
        c.inform("PAUSED", 1)
        r = c._rpc(op="fetch", session=c.session)
        assert r["status"] == "BUSY" and r["reason"] == "paused"
        c.inform("PAUSED", None)
        assert c.generate() is not None


def test_pause_resumes_search(server):
    """PAUSED must suspend, not end, the search: generate() blocks through
    the pause and returns a fresh point once it is lifted (a Tuner driving
    this client must survive an operator pause)."""
    import threading
    import time as _time

    with ServiceClient(server.host, server.port, pause_poll_s=0.05) as c:
        sid = c.create_session([("x", list(range(10)))], strategy="random",
                               name="pause")
        with ServiceClient(server.host, server.port) as admin:
            admin.join(sid)
            admin.inform("PAUSED", 1)
            got = []
            th = threading.Thread(target=lambda: got.append(c.generate()),
                                  daemon=True)
            th.start()
            _time.sleep(0.3)
            assert got == []            # still paused -> still waiting
            admin.inform("PAUSED", None)
            th.join(5.0)
            assert got and got[0] is not None


def test_cfg_value_escaping(server):
    """Config values with quotes/backslashes/non-ASCII round-trip
    unchanged (json.dumps escapes them on the wire)."""
    with ServiceClient(server.host, server.port) as c:
        c.create_session([("x", list(range(3)))], strategy="random",
                         name="esc")
        assert c.inform("NOTE", 'say "hi"\\done') is None
        assert c.query("NOTE") == 'say "hi"\\done'
        c.inform("UNI", "µ-tab\tend")
        assert c.query("UNI") == "µ-tab\tend"


def test_cfg_seeded_at_create(server):
    """Session descriptor may carry an initial cfg dict (hdef cfg keys)."""
    import socket as _socket
    with _socket.create_connection((server.host, server.port),
                                   timeout=10) as s:
        fh = s.makefile("rwb")
        fh.write((json.dumps({
            "op": "session", "name": "seeded",
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


def test_session_api_exposes_cfg(server):
    with ServiceClient(server.host, server.port) as c:
        c.create_session([("x", list(range(5)))], strategy="random",
                         name="cfgview")
        c.inform("PREFETCH_COUNT", 2)
        base = f"http://{server.host}:{server.port}"
        j = json.loads(urllib.request.urlopen(
            base + "/api/session/1", timeout=10).read())
        assert j["cfg"]["PREFETCH_COUNT"] == "2"
        assert j["cfg"]["SESSION_STRATEGY"] == "random"
