"""John Doe cricket dataset: batterRuns regression by mixture of GPs.

Workload parity: reference demos/demo_john_doe.py — 557 filtered seam/right-
arm deliveries, features (stumpsX, stumpsY), target batterRuns ∈ {0,1,4,6},
K=4, 10000 iters, Gaussian(D=K).
"""
from _runner import DemoConfig, run
from modulatedgps_tpu.data import load_john_doe_runs

if __name__ == "__main__":
    run(DemoConfig(
        name="demo_john_doe",
        load_data=lambda rng: load_john_doe_runs(rng=rng),
        K=4, iters=10000,
        pred_kernel=(0.5, 0.5), assign_kernel=(0.1, 1.0),
        plot_1d=False, axis_labels=("StumpsX", "StumpsY"),
    ))
