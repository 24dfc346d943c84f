"""Multi-client tuning sessions (VERDICT r4 weak #6).

AH's parallel-tuning story is N clients joined to ONE session
(harmony_join, hclient.c:156-233): each fetches candidate points,
measures, reports. These tests drive BOTH servers (Python service.py and
the native C++ hserver) with two concurrent threaded clients and pin the
three contracts that make that safe:

- a fetch while the strategy waits on a sibling's outstanding report is
  BUSY/"waiting" (retry), never misread as exhaustion;
- a point is never concurrently double-issued by a parallel strategy
  (PRO hands out distinct round vertices); NM legitimately hands its
  single current trial to every fetcher, and then only the FIRST report
  drives the strategy (stale duplicates are absorbed into history);
- PAUSED drains: in-flight reports are accepted while fetches block.
"""

import threading
import time

import pytest

from offt_tpu.tune.client import ServiceClient
from offt_tpu.tune.service import TuningServer
from offt_tpu.tune.synth import ah_quadratic


@pytest.fixture()
def py_server():
    srv = TuningServer(port=0)
    srv.start_background()
    yield srv.host, srv.port
    srv.shutdown()


@pytest.fixture()
def native_server():
    engine_cpp = pytest.importorskip("offt_tpu.tune.engine_cpp")
    if not engine_cpp.available():
        pytest.skip("no native toolchain")
    proc, port = engine_cpp.spawn_server()
    yield "127.0.0.1", port
    proc.kill()
    proc.wait()


def _drive(host, port, strategy, *, nclients=2, budget=120,
           assert_distinct=False):
    """Run ``nclients`` threaded clients against one session; return
    (best_perf, issue_log, errors). With assert_distinct, record any
    point observed simultaneously in flight on two clients."""
    with ServiceClient(host, port, pause_poll_s=0.02) as c0:
        dims = [(f"v{i}", list(range(1, 101))) for i in range(4)]
        sid = c0.create_session(dims, strategy=strategy, seed=3)

    lock = threading.Lock()
    in_flight: dict[tuple, int] = {}
    double_issued: list[tuple] = []
    issues: list[tuple] = []
    errors: list[BaseException] = []
    best = [float("inf")]

    def worker(cid):
        try:
            with ServiceClient(host, port, pause_poll_s=0.02) as c:
                c.join(sid)
                for _ in range(budget):
                    pt = c.generate(wait_timeout_s=20.0)
                    if pt is None:
                        return
                    with lock:
                        if assert_distinct and pt in in_flight:
                            double_issued.append(pt)
                        in_flight[pt] = cid
                        issues.append(pt)
                    perf = ah_quadratic([p + 1 for p in pt])
                    c.analyze(pt, perf)
                    with lock:
                        in_flight.pop(pt, None)
                        best[0] = min(best[0], perf)
                    if c.converged():
                        return
        except BaseException as e:  # surface thread failures to the test
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(nclients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive(), "client thread hung"
    assert not errors, f"client errors: {errors!r}"
    assert not double_issued, f"concurrently double-issued: {double_issued}"
    return best[0], issues


@pytest.mark.parametrize("strategy", ["nm", "pro", "random"])
def test_two_clients_converge_py(py_server, strategy):
    host, port = py_server
    best, issues = _drive(host, port, strategy,
                          assert_distinct=(strategy == "pro"))
    assert len(issues) >= 8  # both clients actually participated
    assert best <= 1500  # ah_quadratic optimum ~0; any progress beats random-worst ~3e4


@pytest.mark.parametrize("strategy", ["nm", "pro"])
def test_two_clients_converge_native(native_server, strategy):
    host, port = native_server
    best, issues = _drive(host, port, strategy,
                          assert_distinct=(strategy == "pro"))
    assert len(issues) >= 8
    assert best <= 1500


def test_stale_duplicate_report_absorbed(py_server):
    """NM hands its current trial to both clients; the second report must
    neither crash the session nor advance the strategy twice."""
    host, port = py_server
    with ServiceClient(host, port) as c1, ServiceClient(host, port) as c2:
        sid = c1.create_session([(f"v{i}", list(range(1, 101)))
                                 for i in range(3)], strategy="nm", seed=1)
        c2.join(sid)
        p1 = c1.generate()
        p2 = c2.generate()
        assert p1 == p2  # NM: one pending trial, every fetcher gets it
        c1.analyze(p1, 10.0)
        c2.analyze(p2, 99.0)   # stale — absorbed, not a second transition
        # the session must still make progress afterwards
        nxt = c1.generate()
        assert nxt is not None
        c1.analyze(nxt, 5.0)
        assert c1.best() is not None


def test_mid_round_fetch_is_waiting_not_exhausted(py_server):
    """PRO: when every round vertex is issued but unreported, a sibling's
    fetch blocks (BUSY waiting) instead of ending its search; it resumes
    the moment reports complete the round."""
    host, port = py_server
    with ServiceClient(host, port, pause_poll_s=0.02) as c1, \
            ServiceClient(host, port, pause_poll_s=0.02) as c2:
        sid = c1.create_session([(f"v{i}", list(range(1, 101)))
                                 for i in range(3)], strategy="pro", seed=4)
        c2.join(sid)
        held = [c1.generate() for _ in range(4)]  # whole round (size n+1)
        assert all(p is not None for p in held)
        # c2's fetch now has nothing to hand out — must time-bound wait,
        # NOT return None immediately (the pre-fix exhaustion misread)
        t0 = time.monotonic()
        got = c2.generate(wait_timeout_s=0.2)
        assert got is None and time.monotonic() - t0 >= 0.2
        for p in held:
            c1.analyze(p, ah_quadratic([q + 1 for q in p]))
        got = c2.generate(wait_timeout_s=20.0)  # next round exists now
        assert got is not None


def test_paused_drains_reports(py_server):
    """PAUSED blocks fetches but in-flight reports drain (the hclient
    BUSY convention: paused clients keep reporting what they measured)."""
    host, port = py_server
    with ServiceClient(host, port, pause_poll_s=0.02) as c:
        c.create_session([("x", list(range(1, 50)))], strategy="random")
        pt = c.generate()
        assert c.inform("PAUSED", "1") is None  # returns old value
        c.analyze(pt, 7.0)          # drained while paused
        assert c.best() is not None
        done = []

        def unpause():
            time.sleep(0.15)
            with ServiceClient(host, port) as c2:
                c2.join(c.session)
                c2.inform("PAUSED", None)
            done.append(True)

        t = threading.Thread(target=unpause)
        t.start()
        nxt = c.generate()          # blocks through the pause, then serves
        t.join()
        assert done and nxt is not None
