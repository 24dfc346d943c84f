"""Steering a live tuning session with query/inform (round-4 feature).

An operator (or a supervising process) can read and write a running
session's config without stopping the search — the Active Harmony
workflow of ``harmony_query``/``harmony_inform``
(/root/reference/activeharmony/build/hclient.h:95-128,
session-core.c:927-935). This demo runs a worker loop against the
in-process tuning service while a controller:

  1. polls the live STRATEGY_CONVERGED key,
  2. PAUSES the session mid-search (fetch blocks, the worker waits),
  3. attaches an operator note, then un-pauses and lets it finish.

Run:  python examples/steered_tuning.py
"""

import pathlib
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from offt_tpu.tune.client import ServiceClient
from offt_tpu.tune.service import TuningServer
from offt_tpu.tune.synth import ah_quadratic, quadratic_space


def main():
    srv = TuningServer(port=0)
    srv.start_background()
    space = quadratic_space()
    dims = [(d.name, d.values) for d in space.dims]

    worker = ServiceClient("127.0.0.1", srv.port, pause_poll_s=0.05)
    sid = worker.create_session(dims, strategy="nm", name="steered-demo")

    paused_evt = threading.Event()

    def run_search():
        for _ in range(200):
            pt = worker.generate()   # blocks while the session is PAUSED
            if pt is None:
                break
            if paused_evt.is_set():
                print("worker: resumed after pause")
                paused_evt.clear()
            worker.report(pt, ah_quadratic(pt))
        print(f"worker: done, best={worker.best()}")

    th = threading.Thread(target=run_search)
    th.start()

    ctl = ServiceClient("127.0.0.1", srv.port)
    ctl.join(sid)
    time.sleep(0.2)
    print("controller: converged =", ctl.query("STRATEGY_CONVERGED"))

    old = ctl.inform("PAUSED", "1")  # returns the previous value (None)
    print(f"controller: paused the session (old PAUSED={old})")
    paused_evt.set()
    time.sleep(0.3)                  # worker is now blocked in generate()

    note = "operator checkpoint at " + time.strftime("%H:%M")
    ctl.inform("NOTE", note)
    assert ctl.query("NOTE") == note          # config round-trips
    assert ctl.query("PAUSED") == "1"         # still paused right now
    ctl.inform("PAUSED", None)                # erase -> un-pause
    assert ctl.query("PAUSED") is None
    print("controller: un-paused; note =", ctl.query("NOTE"))

    th.join(timeout=60)
    assert not th.is_alive(), "worker did not resume after un-pause"
    best = worker.best()
    from offt_tpu.tune.synth import AH_OPTIMUM
    assert all(abs(b - o) <= 6 for b, o in zip(best, AH_OPTIMUM)), best
    print("controller: final converged =", ctl.query("STRATEGY_CONVERGED"))
    worker.close()
    ctl.close()
    srv.shutdown()


if __name__ == "__main__":
    main()
