"""2-D two-sheet regression.

Workload parity: reference demos/demo_tf2_2d.py — two radial sheets offset
by 10, K=3, Gaussian(D=K), 2000 iters.
"""
from _runner import DemoConfig, run
from modulatedgps_tpu.data import load_toy_2d_data

if __name__ == "__main__":
    run(DemoConfig(
        name="demo_2d",
        load_data=load_toy_2d_data,
        K=3, iters=2000,
        pred_kernel=(0.5, 0.5), assign_kernel=(0.1, 1.0),
        plot_1d=False,
    ))
