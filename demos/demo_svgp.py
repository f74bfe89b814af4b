"""Plain SVGP regression sanity demo (the analog of the reference's
from_online dependency checks, demos/from_online/demo_SVGP.py)."""
import numpy as np

from _common import bootstrap, demo_argparser, save_figure


def main():
    args = demo_argparser(dict(iters=500, K=1)).parse_args()
    jax = bootstrap(args.platform, debug_nans=args.debug_nans)

    import jax.numpy as jnp
    import modulatedgps_tpu as mgp
    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.likelihoods import Gaussian
    from modulatedgps_tpu.data import minibatch_iterator
    from modulatedgps_tpu.utils import kmeans_centers
    from modulatedgps_tpu.training import run_adam
    from modulatedgps_tpu.params import Module, static_field

    rng = np.random.default_rng(args.seed)
    N = 300
    X = rng.uniform(-5, 5, (N, 1))
    Y = np.sin(X) + 0.2 * rng.standard_normal((N, 1))

    kern = SquaredExponential.create(1.0, 1.0)
    Z = kmeans_centers(X, args.num_inducing, seed=0)
    svgp = mgp.SVGP.create(kern, Z, num_latent_gps=1, whiten=True)
    lik = Gaussian.create(variance=0.1)

    # Minimal SVGP ELBO: E_q[log p(y|f)] - KL/N, trained with the shared loop.
    class SVGPRegression(Module):
        svgp: mgp.SVGP
        likelihood: Gaussian
        num_data: int = static_field(default=N)

        def training_loss(self, key, Xb, Yb):
            fmu, fvar = self.svgp.predict_f(Xb)
            ve = self.likelihood.variational_expectations(fmu, fvar, Yb)
            scale = self.num_data / Xb.shape[0]
            return -(jnp.sum(ve) * scale - self.svgp.prior_kl()) / self.num_data

    model = SVGPRegression(svgp=svgp, likelihood=lik, num_data=N)
    it = minibatch_iterator(X, Y, args.batch, seed=args.seed)
    model, iters, elbos = run_adam(model, args.iters, it, args.lr,
                                   key=jax.random.PRNGKey(args.seed))

    Xp = np.linspace(-6, 6, 200)[:, None]
    fmu, fvar = model.svgp.predict_f(jnp.asarray(Xp))
    fmu, fvar = np.asarray(fmu), np.asarray(fvar)
    rmse = float(np.sqrt(np.mean(
        (np.asarray(model.svgp.predict_f(jnp.asarray(X))[0]) - np.sin(X)) ** 2)))
    print(f"RMSE vs true sin: {rmse:.4f}")

    if not args.no_plot:
        import matplotlib
        matplotlib.use("Agg")
        from matplotlib import pyplot as plt
        fig, ax = plt.subplots(1, 2, figsize=(12, 4))
        ax[0].scatter(X, Y, marker="x", alpha=0.4, color="black")
        ax[0].plot(Xp, fmu[:, 0], "-")
        ax[0].fill_between(Xp[:, 0], fmu[:, 0] - 1.96 * np.sqrt(fvar[:, 0]),
                           fmu[:, 0] + 1.96 * np.sqrt(fvar[:, 0]), alpha=0.3)
        ax[0].set_title("SVGP fit")
        ax[1].plot(iters, elbos, "o-", alpha=0.5)
        ax[1].set_title("ELBO")
        save_figure(fig, args.out, "demo_svgp.png")


if __name__ == "__main__":
    main()
