"""John Doe cricket dataset: binary boundary classification.

Workload parity: reference demos/demo_john_doe_multi_class.py — boundary
target ({0,1}→0, {4,6}→1), K=2, MultiClass pred + Gaussian assign, 2000
iters.
"""
from _runner import DemoConfig, run
from modulatedgps_tpu.data import load_john_doe

if __name__ == "__main__":
    run(DemoConfig(
        name="demo_john_doe_multiclass",
        load_data=lambda rng: load_john_doe(rng=rng),
        K=2, iters=2000,
        pred_kernel=(0.1, 1.0), assign_kernel=(0.1, 1.0),
        multiclass=True, plot_1d=False,
        axis_labels=("StumpsX", "StumpsY"),
    ))
