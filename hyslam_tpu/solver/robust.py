"""Robust kernels and the reference's chi-square gating constants.

g2o's RobustKernelHuber (used by every reference optimizer,
e.g. Optimizer.cc:121 `rk->setDelta(sqrt(5.991))`) enters Gauss-Newton as an
IRLS weight w = rho'(e2)/1 applied to the residual block. The chi2 thresholds
5.991 (2-dof, mono) / 7.815 (3-dof, stereo) gate inlier reclassification
(Optimizer.cc:195-207, LocalBundleAdjustment.cc:113-152)."""

from __future__ import annotations

import jax.numpy as jnp

CHI2_MONO = 5.991    # 95% quantile, 2 dof
CHI2_STEREO = 7.815  # 95% quantile, 3 dof


def huber_weight(chi2: jnp.ndarray, delta2) -> jnp.ndarray:
    """IRLS weight for the Huber kernel as a function of the squared error
    chi2 (already information-weighted): 1 inside the basin, delta/sqrt(chi2)
    outside. Matches g2o's robustifyError linearization."""
    safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / safe))


def huber_rho(chi2: jnp.ndarray, delta2) -> jnp.ndarray:
    """Huber cost rho(chi2) (for monitoring/total-cost comparisons)."""
    d = jnp.sqrt(jnp.asarray(delta2))
    e = jnp.sqrt(jnp.maximum(chi2, 0.0))
    return jnp.where(chi2 <= delta2, chi2, 2.0 * d * e - delta2)
