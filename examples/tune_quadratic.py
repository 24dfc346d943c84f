"""Tuner acceptance demo: 6-parameter quadratic with a known optimum.

Parity with Active Harmony's canonical example
(/root/reference/activeharmony/example/client_api/example.c: minimum at
(15, 30, 45, 60, 75, 90) over [1, 100], ~200 iterations).

Run:  python examples/tune_quadratic.py [strategy]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from offt_tpu.tune.synth import AH_OPTIMUM, ah_quadratic, quadratic_space
from offt_tpu.tune.tuner import Tuner


def main():
    strategy = sys.argv[1] if len(sys.argv) > 1 else "nm"
    space = quadratic_space()
    tuner = Tuner(space, objective=ah_quadratic, strategy=strategy,
                  max_trials=200, seed=0)
    best, perf = tuner.run()
    print(f"strategy={strategy} best={best} perf={perf} "
          f"(optimum {AH_OPTIMUM} -> 0)")
    print(f"trials: {len(tuner.trials)}  converged: "
          f"{tuner.strategy.converged()}")


if __name__ == "__main__":
    main()
