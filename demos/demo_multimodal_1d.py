"""1-D multimodal mixture-of-GPs regression (flagship demo).

Workload parity with reference demos/demo_tf2.py: N=1500 three-branch
multimodal data, K=3 experts, M=25 kmeans inducing points (seeds 0/1),
S=25 MC samples, minibatch 500, Adam lr 5e-3, 2000 iters, Gaussian(D=K)
likelihood, SquaredExponential kernels (0.5/0.5 pred, 0.1/1.0 assign).
"""
import numpy as np

from _common import bootstrap, demo_argparser, save_figure, predict_in_batches


def main():
    args = demo_argparser(dict(iters=2000, K=3)).parse_args()
    jax = bootstrap(args.platform, debug_nans=args.debug_nans)

    import jax.numpy as jnp
    import modulatedgps_tpu as mgp
    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.likelihoods import Gaussian
    from modulatedgps_tpu.data import load_toy_multimodal_data, minibatch_iterator
    from modulatedgps_tpu.utils import kmeans_centers
    from modulatedgps_tpu.utils.plotting import four_panel_figure
    from modulatedgps_tpu.training import (run_adam, save_checkpoint,
                                           restore_checkpoint)

    rng = np.random.default_rng(args.seed)
    N, Xtrain, Ytrain, Xtest = load_toy_multimodal_data(rng)
    K = args.K

    pred_kernel = SquaredExponential.create(variance=0.5, lengthscales=0.5)
    assign_kernel = SquaredExponential.create(variance=0.1, lengthscales=1.0)
    Z = kmeans_centers(Xtrain, args.num_inducing, seed=0)
    Z_assign = kmeans_centers(Xtrain, args.num_inducing, seed=1)

    lik = Gaussian.create(variance=0.5, D=K)
    pred_layer = mgp.SVGP.create(pred_kernel, Z, num_latent_gps=K, whiten=True)
    assign_layer = mgp.SVGP.create(assign_kernel, Z_assign, num_latent_gps=K,
                                   whiten=True)
    model = mgp.SMGP(likelihood=lik, pred_layer=pred_layer,
                     assign_layer=assign_layer, K=K,
                     num_samples=args.num_samples, num_data=N)
    if args.resume:
        model = restore_checkpoint(args.resume, model)
    mgp.print_summary(model)

    it = minibatch_iterator(Xtrain, Ytrain, args.batch, seed=args.seed)
    model, iters, elbos = run_adam(
        model, args.iters, it, args.lr, key=jax.random.PRNGKey(args.seed),
        checkpoint_path=args.checkpoint,
        checkpoint_every=args.checkpoint_every,
        resume=bool(args.checkpoint and args.checkpoint_every))
    mgp.print_summary(model)
    if args.checkpoint and not args.checkpoint_every:
        save_checkpoint(args.checkpoint, model)

    key = jax.random.PRNGKey(args.seed + 1)
    S = args.predict_samples
    j_samples = jax.jit(lambda m, k, xb: m.predict_samples(k, xb, S=S))
    j_assign = jax.jit(lambda m, xb: m.predict_assign(xb))
    j_predy = jax.jit(lambda m, xb: m.predict_y(xb))
    samples_y, samples_f = predict_in_batches(
        lambda xb: j_samples(model, key, jnp.asarray(xb)), Xtest)
    assign_probs = np.asarray(j_assign(model, jnp.asarray(Xtrain)))
    fmean, fvar = j_predy(model, jnp.asarray(Xtest))
    fmean_, fvar_ = np.asarray(fmean).mean(0), np.asarray(fvar).mean(0)

    # elbos is empty when a resumed --checkpoint-every run is already at/past
    # --iters (zero new steps) — don't crash the rerun-resumes workflow.
    final_elbo = f"{elbos[-1]:.4f}" if elbos else "(resumed; no new steps)"
    print(f"final ELBO {final_elbo}; assign entropy "
          f"{-np.mean(np.sum(assign_probs * np.log(assign_probs + 1e-12), -1)):.3f}")

    if not args.no_plot:
        import matplotlib
        matplotlib.use("Agg")
        fig = four_panel_figure(Xtrain, Ytrain, Xtest, samples_y, samples_f,
                                iters, elbos, Xtrain, assign_probs,
                                Xtest, fmean_, fvar_, K)
        save_figure(fig, args.out, "demo_multimodal_1d.png")


if __name__ == "__main__":
    main()
