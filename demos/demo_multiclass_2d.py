"""2-D quadrant classification with outliers.

Workload parity: reference demos/demo_tf2_2d_modified_multiclass.py —
quadrant indicator with 10% flips, K=2, MultiClass pred + Gaussian assign.
"""
from _runner import DemoConfig, run
from modulatedgps_tpu.data import load_toy_2d_data_categorical

if __name__ == "__main__":
    run(DemoConfig(
        name="demo_multiclass_2d",
        load_data=load_toy_2d_data_categorical,
        K=2, iters=2000,
        pred_kernel=(0.1, 1.0), assign_kernel=(0.1, 1.0),
        multiclass=True, plot_1d=False,
    ))
