"""1-D multimodal data with SMGPModified (separate assignment likelihood).

Workload parity: reference demos/demo_tf2_modified.py — same data as
demo_tf2, 4000 iters, Gaussian pred + Gaussian assign likelihoods.
"""
from _runner import DemoConfig, run
from modulatedgps_tpu.data import load_toy_multimodal_data

if __name__ == "__main__":
    run(DemoConfig(
        name="demo_multimodal_1d_modified",
        load_data=load_toy_multimodal_data,
        K=3, iters=4000,
        pred_kernel=(0.5, 0.5), assign_kernel=(0.1, 1.0),
        modified=True,
    ))
