"""Generic SMGP/SMGPModified demo runner.

Each demo family (reference demos/demo_tf2*.py, demo_john_doe*.py) is the
same pipeline with different data, kernels, likelihood and model variant;
this runner owns the pipeline, the demo files own the configuration —
the typed-config analog of the reference's inline constants (SURVEY.md §5.6).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

from _common import bootstrap, demo_argparser, save_figure, predict_in_batches


@dataclasses.dataclass
class DemoConfig:
    name: str
    load_data: Callable         # rng -> (N, Xtrain, Ytrain, Xtest[, attrs])
    K: int
    iters: int
    pred_kernel: tuple          # (variance, lengthscales)
    assign_kernel: tuple
    multiclass: bool = False    # MultiClass pred lik + SMGPModified
    modified: bool = False      # SMGPModified with Gaussian assign lik
    lik_variance: float = 0.5
    plot_1d: bool = True        # 4-panel 1-D figure (else 2-D scatter figure)


def run(cfg: DemoConfig, argv=None):
    args = demo_argparser(dict(iters=cfg.iters, K=cfg.K)).parse_args(argv)
    jax = bootstrap(args.platform, debug_nans=args.debug_nans)

    import jax.numpy as jnp
    import modulatedgps_tpu as mgp
    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.likelihoods import Gaussian, MultiClass
    from modulatedgps_tpu.data import minibatch_iterator
    from modulatedgps_tpu.utils import kmeans_centers
    from modulatedgps_tpu.training import (run_adam, save_checkpoint,
                                           restore_checkpoint)

    rng = np.random.default_rng(args.seed)
    loaded = cfg.load_data(rng)
    N, Xtrain, Ytrain, Xtest = loaded[:4]
    K = args.K

    pred_kernel = SquaredExponential.create(*cfg.pred_kernel)
    assign_kernel = SquaredExponential.create(*cfg.assign_kernel)
    Z = kmeans_centers(Xtrain, args.num_inducing, seed=0)
    Z_assign = kmeans_centers(Xtrain, args.num_inducing, seed=1)

    assign_lik = Gaussian.create(variance=cfg.lik_variance, D=K)
    if cfg.multiclass:
        lik = MultiClass.create(K)
    else:
        lik = Gaussian.create(variance=cfg.lik_variance, D=K)

    pred_layer = mgp.SVGP.create(pred_kernel, Z, num_latent_gps=K, whiten=True)
    assign_layer = mgp.SVGP.create(assign_kernel, Z_assign, num_latent_gps=K,
                                   whiten=True)
    if cfg.multiclass or cfg.modified:
        model = mgp.SMGPModified(likelihood=lik, assign_likelihood=assign_lik,
                                 pred_layer=pred_layer, assign_layer=assign_layer,
                                 K=K, num_samples=args.num_samples, num_data=N)
    else:
        model = mgp.SMGP(likelihood=lik, pred_layer=pred_layer,
                         assign_layer=assign_layer, K=K,
                         num_samples=args.num_samples, num_data=N)
    if args.resume:
        model = restore_checkpoint(args.resume, model)
    mgp.print_summary(model)

    metrics = None
    if args.metrics:
        from modulatedgps_tpu.utils import MetricsLogger
        metrics = MetricsLogger(args.metrics, verbose=False)
    it = minibatch_iterator(Xtrain, Ytrain, args.batch, seed=args.seed)
    # --checkpoint + --checkpoint-every N = preemption-safe training: the
    # full TrainState is saved atomically every N steps and a rerun of the
    # same command resumes from the last save.
    model, iters, elbos = run_adam(
        model, args.iters, it, args.lr, key=jax.random.PRNGKey(args.seed),
        callback=(lambda i, e, s: metrics.log(i, elbo=e)) if metrics else None,
        checkpoint_path=args.checkpoint,
        checkpoint_every=args.checkpoint_every,
        resume=bool(args.checkpoint and args.checkpoint_every))
    if metrics:
        metrics.close()
    mgp.print_summary(model)
    if args.checkpoint and not args.checkpoint_every:
        # model-only artifact (pairs with --resume); with --checkpoint-every
        # the file already holds the full TrainState from the periodic saves.
        save_checkpoint(args.checkpoint, model)

    # ---- predictions -----------------------------------------------------
    # jit with the model as an ARGUMENT (never closed over: a closed-over
    # device constant degrades every later dispatch on the TPU relay).
    key = jax.random.PRNGKey(args.seed + 1)
    S = args.predict_samples
    j_samples = jax.jit(lambda m, k, xb: m.predict_samples(k, xb, S=S))
    j_assign = jax.jit(lambda m, xb: m.predict_assign(xb))
    j_predy = jax.jit(lambda m, xb: m.predict_y(xb))
    samples_y = samples_f = None
    if not cfg.multiclass:
        samples_y, samples_f = predict_in_batches(
            lambda xb: j_samples(model, key, jnp.asarray(xb)), Xtest)
    assign_probs = np.asarray(j_assign(model, jnp.asarray(Xtrain)))
    fmean, fvar = j_predy(model, jnp.asarray(Xtest))
    fmean_, fvar_ = np.asarray(fmean).mean(0), np.asarray(fvar).mean(0)

    if elbos:
        print(f"final ELBO {elbos[-1]:.4f}")
    else:
        # Resumed run already at/past --iters: no new steps, no history —
        # report the restored model's training loss instead of crashing.
        loss = jax.jit(lambda m, k, xb, yb: m.training_loss(k, xb, yb))(
            model, jax.random.PRNGKey(args.seed),
            jnp.asarray(Xtrain[:args.batch]), jnp.asarray(Ytrain[:args.batch]))
        print(f"no new steps (resumed past --iters); restored ELBO "
              f"{-float(loss):.4f}")

    if not args.no_plot:
        import matplotlib
        matplotlib.use("Agg")
        from matplotlib import pyplot as plt
        from modulatedgps_tpu.utils.plotting import four_panel_figure
        if cfg.plot_1d:
            if samples_y is None:
                # multiclass: no mixture samples; scatter class probs instead
                fig, ax = plt.subplots(2, 2, figsize=(14, 8))
                ax[0, 0].scatter(Xtrain[:, 0], Ytrain, marker="x", c="black",
                                 alpha=0.3)
                for i in range(K):
                    ax[0, 0].plot(Xtest[:, 0], fmean_[:, i], "-",
                                  label=f"P(class {i})")
                ax[0, 0].legend(); ax[0, 0].grid()
                ax[0, 0].set_title("class probabilities")
                ax[0, 1].plot(iters, elbos, "o-", ms=8, alpha=0.5)
                ax[0, 1].set_xlabel("Iterations"); ax[0, 1].set_ylabel("ELBO")
                ax[0, 1].grid()
                ax[1, 0].plot(Xtrain[:, 0], assign_probs, "o")
                ax[1, 0].set_ylabel("softmax(assignment)"); ax[1, 0].grid()
                lb = fmean_ - 2 * np.sqrt(fvar_); ub = fmean_ + 2 * np.sqrt(fvar_)
                for i in range(K):
                    ax[1, 1].plot(Xtest[:, 0], fmean_[:, i], "-")
                    ax[1, 1].fill_between(Xtest[:, 0], lb[:, i], ub[:, i], alpha=0.3)
                ax[1, 1].grid(); ax[1, 1].set_ylabel("Pred. of GP experts")
                fig.tight_layout()
            else:
                fig = four_panel_figure(Xtrain, Ytrain, Xtest, samples_y,
                                        samples_f, iters, elbos, Xtrain,
                                        assign_probs, Xtest, fmean_, fvar_, K)
        else:
            # 2-D inputs: 3-D scatter figure + axis-slice figure (parity
            # with reference demos/demo_tf2_2d.py:128-173).
            fig = plt.figure(figsize=(14, 6))
            axa = fig.add_subplot(1, 2, 1, projection="3d")
            axa.scatter(Xtrain[:, 0], Xtrain[:, 1], Ytrain[:, 0], marker="x",
                        c=np.argmax(assign_probs, 1), cmap="tab10", alpha=0.6)
            axa.set_title("train data colored by argmax assignment")
            if samples_y is not None:
                axb = fig.add_subplot(1, 2, 2, projection="3d")
                Xt2 = np.tile(Xtest, (samples_y.shape[0], 1))
                axb.scatter(Xt2[:, 0], Xt2[:, 1],
                            samples_y.reshape(-1), marker="+", alpha=0.02,
                            color="tab:red")
                axb.set_title("mixture samples")
            fig.tight_layout()
            save_figure(fig, args.out, f"{cfg.name}_3d.png")

            # slice figure: ELBO + assignment/prediction along each axis
            # with the other coordinate held at a constant
            c0, c1 = -0.25, 0.75
            line = np.linspace(Xtrain.min(0), Xtrain.max(0), 200)
            slices = [
                np.c_[line[:, 0], np.full(200, c1)],
                np.c_[np.full(200, c0), line[:, 1]],
            ]
            fig2, ax2 = plt.subplots(1, 5, figsize=(24, 4))
            ax2[0].plot(iters, elbos, "o-", ms=8, alpha=0.5)
            ax2[0].set_xlabel("Iterations"); ax2[0].set_ylabel("ELBO")
            ax2[0].grid()
            for i, Xs in enumerate(slices):
                title = (f"x2 = {c1}" if i == 0 else f"x1 = {c0}")
                a = np.asarray(j_assign(model, jnp.asarray(Xs)))
                ax2[1 + i].plot(Xs[:, i], a, "o", markersize=1)
                ax2[1 + i].set_title(title)
                ax2[1 + i].set_ylabel("softmax(assignment)"); ax2[1 + i].grid()
                fm, fv = j_predy(model, jnp.asarray(Xs))
                fm = np.asarray(fm).mean(0); fv = np.asarray(fv).mean(0)
                lb2, ub2 = fm - 2 * np.sqrt(fv), fm + 2 * np.sqrt(fv)
                for k in range(K):
                    ax2[3 + i].plot(Xs[:, i], fm[:, k], "-")
                    ax2[3 + i].fill_between(Xs[:, i], lb2[:, k], ub2[:, k],
                                            alpha=0.3)
                ax2[3 + i].set_title(title)
                ax2[3 + i].set_ylabel("Pred. of GP experts"); ax2[3 + i].grid()
            fig2.tight_layout()
            save_figure(fig2, args.out, f"{cfg.name}_slices.png")
            fig = None
        if fig is not None:
            save_figure(fig, args.out, f"{cfg.name}.png")

    return model, iters, elbos
