"""1-D classification with outliers: MultiClass(RobustMax) pred likelihood.

Workload parity: reference demos/demo_tf2_modified_multiclass.py — step
data with 10% flips, K=2, MultiClass pred + Gaussian assign likelihoods,
2000 iters, kernels (0.1, 1.0)/(0.1, 1.0).
"""
from _runner import DemoConfig, run
from modulatedgps_tpu.data import load_toy_data_categorical

if __name__ == "__main__":
    run(DemoConfig(
        name="demo_multiclass_1d",
        load_data=load_toy_data_categorical,
        K=2, iters=2000,
        pred_kernel=(0.1, 1.0), assign_kernel=(0.1, 1.0),
        multiclass=True,
    ))
