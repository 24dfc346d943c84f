"""Native C++ tuning engine: same acceptance tests as the Python strategies
(Active Harmony example-quadratic parity, SURVEY.md §4.4)."""

import pytest

from offt_tpu.tune.synth import ah_quadratic, quadratic_space
from offt_tpu.tune.tuner import Tuner

engine_cpp = pytest.importorskip("offt_tpu.tune.engine_cpp")

if not engine_cpp.available():
    pytest.skip("no native toolchain", allow_module_level=True)


def run_native(name, max_trials=400, seed=3):
    space = quadratic_space()
    strat = engine_cpp.make_native_strategy(name, space, seed=seed)
    tuner = Tuner(space, objective=ah_quadratic, strategy=strat,
                  max_trials=max_trials)
    return tuner.run() + (tuner,)


def test_native_random():
    best, perf, _ = run_native("random", max_trials=300)
    assert perf < 6 * 50 ** 2


def test_native_nm():
    best, perf, _ = run_native("nm", max_trials=500)
    assert perf <= 40, f"native nm best {best} perf {perf}"


def test_native_pro():
    # PRO is coarse near domain boundaries; expect within a few grid steps
    # per dimension (random search at this budget lands ~2000+)
    best, perf, t = run_native("pro", max_trials=500)
    assert perf <= 400, f"native pro best {best} perf {perf}"
    assert t.strategy.converged()


def test_native_brute_exhaustive():
    from offt_tpu.plan.params import ProblemSpec
    from offt_tpu.tune.space import Dimension
    from offt_tpu.tune.synth import _SynthSpace

    spec = ProblemSpec(shape=(1, 1, 1))
    space = _SynthSpace(
        spec=spec,
        dims=tuple(Dimension(f"v{i}", tuple(range(5, 16))) for i in range(2)),
    )
    strat = engine_cpp.make_native_strategy("brute", space)
    obj = lambda vals: (vals[0] - 7) ** 2 + (vals[1] - 12) ** 2
    tuner = Tuner(space, objective=obj, strategy=strat, max_trials=10_000)
    best, perf = tuner.run()
    assert best == (7, 12)
    assert perf == 0


def test_native_matches_python_protocol():
    space = quadratic_space()
    strat = engine_cpp.make_native_strategy("nm", space, seed=1,
                                            init_simplex=[(0,) * 6])
    pt = strat.generate()
    assert pt is not None and len(pt) == 6
    strat.analyze(pt, 123.0)
    assert strat.best() == pt
