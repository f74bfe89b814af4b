"""VGP + Bernoulli classification sanity demo.

Analog of the reference's dependency check
reference demos/from_online/demo_SVGP_bernoulli.py: a 7-point binary
dataset, a VGP with SquaredExponential kernel and Bernoulli (probit)
likelihood, trained full-batch with the Scipy L-BFGS optimizer, then a
3-panel figure (latent f with 95% band, predictive mean, data).
"""
import numpy as np

from _common import bootstrap, demo_argparser, save_figure


def main():
    args = demo_argparser(dict(iters=2000)).parse_args()
    bootstrap(args.platform, debug_nans=args.debug_nans)

    import jax.numpy as jnp
    from modulatedgps_tpu.models import VGP
    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.likelihoods import Bernoulli
    from modulatedgps_tpu.params import print_summary
    from modulatedgps_tpu.training import run_scipy

    # Same 7-point dataset as the reference demo.
    X = np.array([2.0, 4, 7, 9, 17, 19, 21])[:, None]
    Y = np.array([1.0, 1, 1, 1, 0, 0, 0])[:, None]

    model = VGP.create(SquaredExponential.create(1.0, 1.0), Bernoulli(),
                       X, Y, num_latent_gps=1)
    print_summary(model)
    model, result = run_scipy(model, maxiter=args.iters, verbose=True)
    print_summary(model)
    print(f"final ELBO: {float(model.elbo()):.6f} "
          f"(L-BFGS nit={result.nit}, converged={result.success})")

    Xj = jnp.asarray(X, model.X.dtype)
    fmean, fvar = model.predict_f(Xj)
    ymean, _ = model.predict_y(Xj)
    fmean, fvar, ymean = (np.asarray(a).ravel() for a in (fmean, fvar, ymean))
    print("p(y=1|x):", np.round(ymean, 3))

    if not args.no_plot:
        import matplotlib
        matplotlib.use("Agg")
        from matplotlib import pyplot as plt
        fig, (ax1, ax2, ax3) = plt.subplots(3, 1, sharex=True, figsize=(8, 8))
        x = X.ravel()
        ax1.plot(x, fmean, marker="x", color="black")
        ax1.fill_between(x, fmean - 1.96 * np.sqrt(fvar),
                         fmean + 1.96 * np.sqrt(fvar), color="C0", alpha=0.2)
        ax1.set_ylabel("f(x)")
        ax2.plot(x, ymean, marker="x", color="blue")
        ax2.set_ylabel("p(y=1)")
        ax3.scatter(x, Y.ravel(), marker="x", color="red", s=45)
        ax3.set_ylabel("Y")
        ax3.set_xlabel("X")
        save_figure(fig, args.out, "demo_vgp_bernoulli.png")


if __name__ == "__main__":
    main()
