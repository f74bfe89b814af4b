"""Figure builders reproducing the reference demo panels.

Four-panel layout parity (reference demos/demo_tf2.py:77-110):
  [0,0] mixture sample scatter over the test inputs + train data
  [0,1] ELBO vs iteration
  [1,0] softmax assignment probabilities
  [1,1] per-expert predictive bands (mean ± 2 std)
Plus the SVGP diagnostic helpers (reference utils/plotting_utils.py:7-36).
"""
from __future__ import annotations

import numpy as np

__all__ = ["four_panel_figure", "plot_kernel_samples", "plot_kernel_prediction"]

_TAB = ["tab:blue", "tab:orange", "tab:green", "tab:red", "tab:purple",
        "tab:brown", "tab:pink", "tab:gray", "tab:olive", "tab:cyan"]


def four_panel_figure(Xtrain, Ytrain, Xplot, samples_y, samples_f,
                      iters, elbos, assign_X, assign_probs,
                      pred_X, fmean, fvar, K: int):
    """Build the canonical 4-panel demo figure; returns the matplotlib fig.

    samples_y/samples_f: [S, Nplot, 1]; fmean/fvar: [Nplot, K];
    assign_probs: [N, K].
    """
    from matplotlib import pyplot as plt

    S = samples_y.shape[0]
    f, ax = plt.subplots(2, 2, figsize=(14, 8))

    Xt = np.tile(Xplot[:, :1], (S, 1))
    ax[0, 0].scatter(Xt.ravel(), np.reshape(samples_y, (-1,)), marker="+",
                     alpha=0.01, color="tab:red")
    ax[0, 0].scatter(Xt.ravel(), np.reshape(samples_f, (-1,)), marker="+",
                     alpha=0.01, color="tab:blue")
    ax[0, 0].scatter(Xtrain[:, 0], Ytrain, marker="x", color="black", alpha=0.1)
    ax[0, 0].set_title("Many GPs")
    ax[0, 0].set_xlabel("x")
    ax[0, 0].set_ylabel("y")
    ax[0, 0].set_ylim(1.2 * float(np.min(Ytrain)), 1.2 * float(np.max(Ytrain)))
    ax[0, 0].grid()

    ax[0, 1].plot(iters, elbos, "o-", ms=8, alpha=0.5)
    ax[0, 1].set_xlabel("Iterations")
    ax[0, 1].set_ylabel("ELBO")
    ax[0, 1].grid()

    ax[1, 0].plot(assign_X[:, 0], assign_probs, "o")
    ax[1, 0].set_xlabel("x")
    ax[1, 0].set_ylabel("softmax(assignment)")
    ax[1, 0].grid()

    lb = fmean - 2.0 * np.sqrt(fvar)
    ub = fmean + 2.0 * np.sqrt(fvar)
    for i in range(K):
        c = _TAB[i % len(_TAB)]
        ax[1, 1].plot(pred_X[:, 0], fmean[:, i], "-", alpha=1.0, color=c)
        ax[1, 1].fill_between(pred_X[:, 0], lb[:, i], ub[:, i], alpha=0.3, color=c)
    ax[1, 1].scatter(Xtrain[:, 0], Ytrain, marker="x", color="black", alpha=0.5)
    ax[1, 1].set_xlabel("x")
    ax[1, 1].set_ylabel("Pred. of GP experts")
    ax[1, 1].grid()

    f.tight_layout()
    return f


def plot_kernel_samples(ax, svgp, key, lo=-6.0, hi=6.0, n: int = 100,
                        n_samples: int = 3) -> None:
    """SVGP prior/posterior function draws (reference
    utils/plotting_utils.py:7-13)."""
    import jax.numpy as jnp
    Xplot = np.linspace(lo, hi, n)[:, None]
    fs = svgp.predict_f_samples(key, jnp.asarray(Xplot), n_samples)
    ax.plot(Xplot, np.asarray(fs)[:, :, 0].T)
    ax.set_title("Example $f$s")


def plot_kernel_prediction(ax, svgp, lo=-6.0, hi=6.0, n: int = 100) -> None:
    """Mean ± 1.96 std bands (reference utils/plotting_utils.py:16-31)."""
    import jax.numpy as jnp
    Xplot = np.linspace(lo, hi, n)[:, None]
    f_mean, f_var = svgp.predict_f(jnp.asarray(Xplot))
    f_mean, f_var = np.asarray(f_mean), np.asarray(f_var)
    f_lower = f_mean - 1.96 * np.sqrt(f_var)
    f_upper = f_mean + 1.96 * np.sqrt(f_var)
    lines = ax.plot(Xplot, f_mean, "-")
    for i, line in enumerate(lines):
        color = line.get_color()
        ax.fill_between(Xplot[:, 0], f_lower[:, i], f_upper[:, i],
                        color=color, alpha=0.1)
    ax.set_title("Example data fit")
