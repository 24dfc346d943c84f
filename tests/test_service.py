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
