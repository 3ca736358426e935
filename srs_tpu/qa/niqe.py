"""Full NIQE (Mittal et al. 2013) and a trained BRISQUE — no-reference
quality as the reference's *preferred* path provides it.

The reference prefers pyiqa's pretrained NIQE/BRISQUE when installed
(reference: quality_assessment_module.py:148-167) and only falls back to
closed-form approximations. This module supplies the pretrained tier
without network access:

- :func:`niqe_features` / :func:`niqe_score` — the actual NIQE algorithm:
  per-patch NSS features (GGD fit of MSCN coefficients + AGGD fits of the
  four orientation products, at two scales = 36-D), scored as the
  Mahalanobis-type distance between the test feature Gaussian and a
  *pristine* multivariate Gaussian. The pristine model is fitted on
  real bundled photographs (multi-scale crops of the 17-source pool,
  holdout excluded) plus the crisp half of ``render_photo`` scenes by
  ``scripts/fit_qa_models.py`` and packaged as
  ``qa/data/niqe_pristine.npz`` with a capped affine calibration so a
  clean photograph scores inside the reference "good" band.
- :func:`brisque_features` / :func:`brisque_score` — BRISQUE's 36-D
  feature vector scored by a ridge regressor trained on procedurally
  distorted corpus images (blur/noise/JPEG ladders with severity-derived
  pseudo-DMOS), packaged as ``qa/data/brisque_model.npz``.

All feature math is jnp (jit-able, TPU-ready); the alpha parameter of the
G/AGGD fits is solved by moment matching against a precomputed gamma-ratio
table (the standard estimator), which is a table lookup — no host solver.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filters import gaussian_blur
from .noref import _gray, mscn

__all__ = [
    "niqe_features",
    "niqe_score",
    "niqe_scores",
    "brisque_features",
    "brisque_score",
    "brisque_scores",
    "fit_pristine_model",
    "DATA_DIR",
]

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

# Moment-matching tables: rho(alpha) = Gamma(1/a)Gamma(3/a)/Gamma(2/a)^2
# (AGGD) and gamma-ratio for GGD. Precomputed once in float64 numpy.
_ALPHA_GRID = np.arange(0.2, 10.001, 0.001)


@lru_cache(maxsize=1)
def _ggd_table() -> Tuple[np.ndarray, np.ndarray]:
    from scipy.special import gamma as G  # scipy is in the dev deps

    a = _ALPHA_GRID
    rho = (G(1.0 / a) * G(3.0 / a)) / (G(2.0 / a) ** 2)
    return a.astype(np.float32), rho.astype(np.float32)


@lru_cache(maxsize=1)
def _gamma_ratio_table() -> Tuple[np.ndarray, np.ndarray]:
    """gamma(2/a)/gamma(1/a) and gamma(3/a)/gamma(1/a) over the grid (for
    AGGD mean/variance reconstruction)."""
    from scipy.special import gamma as G

    a = _ALPHA_GRID
    g21 = G(2.0 / a) / G(1.0 / a)
    g31 = G(3.0 / a) / G(1.0 / a)
    return g21.astype(np.float32), g31.astype(np.float32)


def _fit_ggd(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """GGD (alpha, sigma^2) by moment matching over flattened coeffs."""
    alphas, rho_tab = _ggd_table()
    sig_sq = jnp.mean(x * x)
    e_abs = jnp.mean(jnp.abs(x))
    rho = sig_sq / jnp.maximum(e_abs * e_abs, 1e-12)
    idx = jnp.argmin(jnp.abs(jnp.asarray(rho_tab) - rho))
    return jnp.asarray(alphas)[idx], sig_sq


def _fit_aggd(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """AGGD (alpha, mean, left var, right var) by moment matching."""
    alphas, rho_tab = _ggd_table()
    g21, g31 = _gamma_ratio_table()
    neg = jnp.where(x < 0, x, 0.0)
    pos = jnp.where(x > 0, x, 0.0)
    n_neg = jnp.maximum(jnp.sum(x < 0), 1)
    n_pos = jnp.maximum(jnp.sum(x > 0), 1)
    l_sq = jnp.sum(neg * neg) / n_neg
    r_sq = jnp.sum(pos * pos) / n_pos
    l_std = jnp.sqrt(l_sq)
    r_std = jnp.sqrt(r_sq)
    gamma_hat = l_std / jnp.maximum(r_std, 1e-12)
    e_abs = jnp.mean(jnp.abs(x))
    rho_hat = jnp.mean(x * x) / jnp.maximum(e_abs * e_abs, 1e-12)
    g = gamma_hat
    rho_norm = rho_hat * (g**3 + 1.0) * (g + 1.0) / jnp.maximum((g * g + 1.0) ** 2, 1e-12)
    idx = jnp.argmin(jnp.abs(jnp.asarray(rho_tab) - rho_norm))
    alpha = jnp.asarray(alphas)[idx]
    # Mean feature: classic NIQE uses the model-implied
    # (r_std - l_std) * gamma(2/a)/gamma(1/a), but gamma(2/a)/gamma(1/a)
    # explodes (~1.5e4 at a=0.2) on degenerate near-flat patches, and those
    # junk directions then dominate the pristine covariance. The empirical
    # mean of the product coefficients is the same quantity under the AGGD
    # model, bounded, and applied identically at fit and test time.
    del g21
    eta = jnp.mean(x)
    return alpha, eta, l_sq, r_sq


def _paired_products(m: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    h = m[:, :-1] * m[:, 1:]
    v = m[:-1, :] * m[1:, :]
    d1 = m[:-1, :-1] * m[1:, 1:]
    d2 = m[:-1, 1:] * m[1:, :-1]
    return h, v, d1, d2


def _scale_features(gray: jax.Array) -> jax.Array:
    """18 NSS features of one scale: GGD(mscn) 2 + AGGD(4 products) x 4."""
    m = mscn(gray)
    a, s = _fit_ggd(m.reshape(-1))
    feats = [a, s]
    for prod in _paired_products(m):
        alpha, eta, l_sq, r_sq = _fit_aggd(prod.reshape(-1))
        feats.extend([alpha, eta, l_sq, r_sq])
    return jnp.stack(feats)


def _half_scale(gray: jax.Array) -> jax.Array:
    """Low-pass + 2x decimate (NIQE's second scale)."""
    g = gaussian_blur(gray, 7, 7.0 / 6.0)
    return g[::2, ::2]


@jax.jit
def _image_features36(gray: jax.Array) -> jax.Array:
    return jnp.concatenate([_scale_features(gray), _scale_features(_half_scale(gray))])


@jax.jit
def _sigma_field(gray: jax.Array) -> jax.Array:
    """Local contrast field (the sigma of the MSCN normalization)."""
    g = gray.astype(jnp.float32)
    mu = gaussian_blur(g, 7, 7.0 / 6.0)
    sigma_sq = gaussian_blur(g * g, 7, 7.0 / 6.0) - mu * mu
    return jnp.sqrt(jnp.maximum(sigma_sq, 0.0))


def niqe_features(image: jax.Array, patch: int = 96, select: float = 0.75) -> np.ndarray:
    """[P, 36] NSS features over the non-overlapping patch grid, keeping
    only patches whose mean local contrast exceeds ``select`` x the
    per-image max (NIQE's sharpness-based patch selection — the step that
    makes the metric blur-sensitive: a blurred image's *sharpest* patches
    still have blurred statistics). Selection is applied identically at
    fit time (scripts/fit_qa_models.py) and test time."""
    g = _gray(image).astype(jnp.float32)
    h, w = g.shape[-2], g.shape[-1]
    ph, pw = h // patch, w // patch
    if ph == 0 or pw == 0:  # small image: single feature vector
        return np.asarray(_image_features36(g))[None]
    g = g[: ph * patch, : pw * patch]
    patches = g.reshape(ph, patch, pw, patch).transpose(0, 2, 1, 3).reshape(-1, patch, patch)
    feats = np.asarray(jax.vmap(_image_features36)(patches))
    if select <= 0.0:
        return feats
    sharp = np.asarray(jax.vmap(lambda p: jnp.mean(_sigma_field(p)))(patches))
    keep = sharp >= select * float(sharp.max())
    return feats[keep] if keep.any() else feats


def fit_pristine_model(
    images, patch: int = 96, shrink: float = 0.0
) -> Dict[str, np.ndarray]:
    """Fit the pristine MVG (mu, cov) over feature vectors of a corpus.

    ``shrink`` applies diagonal covariance shrinkage
    ``cov <- (1-s)*cov + s*diag(cov)``: with a few hundred pristine
    patches the raw 36x36 covariance is overconfident along thin
    directions of natural image-to-image variation, which inflates the
    Mahalanobis distance of held-out *clean* images far above the
    distortion signal (measured: unshrunk LOO distances of real photos
    were 40-240 vs ~4-13 at s=0.1). The packaged model ships s=0.1
    (scripts/fit_qa_models.py)."""
    feats = []
    for im in images:
        feats.append(np.asarray(niqe_features(jnp.asarray(im, jnp.float32), patch)))
    f = np.concatenate(feats, axis=0)
    f = f[np.all(np.isfinite(f), axis=1)]
    mu = f.mean(axis=0)
    cov = np.cov(f, rowvar=False)
    if shrink > 0.0:
        cov = (1.0 - shrink) * cov + shrink * np.diag(np.diag(cov))
    return {"mu": mu.astype(np.float64), "cov": cov.astype(np.float64)}


@lru_cache(maxsize=1)
def _load_pristine() -> Optional[Tuple[np.ndarray, np.ndarray, float, float]]:
    """(mu, cov, scale_a, scale_b). The affine scale maps the raw
    Mahalanobis distance onto the published NIQE scale the reference's
    thresholds assume (good<3 / acceptable<5 / poor<8, reference
    quality_assessment_module.py:63-70) — anchored at fit time on a
    held-out pristine median (->2.5) and a blur-severity-3 median (->8.0);
    see scripts/fit_qa_models.py. Older npz files without anchors load as
    the identity scale."""
    path = os.path.join(DATA_DIR, "niqe_pristine.npz")
    if not os.path.exists(path):
        return None
    z = np.load(path)
    a = float(z["scale_a"]) if "scale_a" in z else 1.0
    b = float(z["scale_b"]) if "scale_b" in z else 0.0
    return z["mu"], z["cov"], a, b


def _mahalanobis_score(f: np.ndarray, mu_p: np.ndarray, cov_p: np.ndarray) -> Optional[float]:
    f = f[np.all(np.isfinite(f), axis=1)]
    if f.shape[0] == 0:
        return None
    mu_t = f.mean(axis=0)
    cov_t = np.cov(f, rowvar=False) if f.shape[0] > 1 else np.zeros_like(cov_p)
    d = mu_p - mu_t
    s = (cov_p + cov_t) / 2.0 + 1e-8 * np.eye(len(mu_p))
    try:
        return float(np.sqrt(max(d @ np.linalg.solve(s, d), 0.0)))
    except np.linalg.LinAlgError:
        return None


def niqe_scores(images: jax.Array, patch: int = 96, select: float = 0.75):
    """Batched NIQE over [N, H, W, C]: features for every patch of every
    image in ONE vmapped device program (a per-image loop costs a device
    round-trip per dispatch — significant over a tunneled link), then
    per-image selection + Mahalanobis on host. Returns list of
    Optional[float]."""
    model = _load_pristine()
    if model is None:
        return [None] * int(images.shape[0])
    mu_p, cov_p, sa, sb = model

    def cal(v):
        return None if v is None else max(sa * v + sb, 0.0)

    n = int(images.shape[0])
    g = jax.vmap(lambda im: _gray(im).astype(jnp.float32))(images)
    h, w = g.shape[-2], g.shape[-1]
    ph, pw = h // patch, w // patch
    if ph == 0 or pw == 0:
        feats = np.asarray(jax.vmap(_image_features36)(g), np.float64)
        return [cal(_mahalanobis_score(feats[i : i + 1], mu_p, cov_p)) for i in range(n)]
    g = g[:, : ph * patch, : pw * patch]
    patches = g.reshape(n, ph, patch, pw, patch).transpose(0, 1, 3, 2, 4).reshape(
        n * ph * pw, patch, patch
    )
    feats = jax.vmap(_image_features36)(patches)
    sharp = jax.vmap(lambda p: jnp.mean(_sigma_field(p)))(patches)
    feats_np = np.asarray(feats, np.float64).reshape(n, ph * pw, 36)
    sharp_np = np.asarray(sharp).reshape(n, ph * pw)
    out = []
    for i in range(n):
        keep = sharp_np[i] >= select * float(sharp_np[i].max())
        f = feats_np[i][keep] if keep.any() and select > 0 else feats_np[i]
        out.append(cal(_mahalanobis_score(f, mu_p, cov_p)))
    return out


def brisque_scores(images: jax.Array):
    """Batched BRISQUE over [N, H, W, C]: one vmapped feature program,
    regressor on host. Returns list of Optional[float]."""
    model = _load_brisque()
    if model is None:
        return [None] * int(images.shape[0])
    w, b, mu, sd = model
    g = jax.vmap(lambda im: _gray(im).astype(jnp.float32))(images)
    feats = np.asarray(jax.vmap(_image_features36)(g), np.float64)
    out = []
    for f in feats:
        if not np.all(np.isfinite(f)):
            out.append(None)
            continue
        z = brisque_expand((f - mu) / sd)
        out.append(float(np.clip(z @ w + b, 0.0, 100.0)))
    return out


def niqe_score(image: jax.Array, patch: int = 96) -> Optional[float]:
    """Full NIQE: distance between the test-image feature Gaussian and the
    packaged pristine model; None when the model is not packaged."""
    model = _load_pristine()
    if model is None:
        return None
    mu_p, cov_p, sa, sb = model
    f = np.asarray(niqe_features(image, patch), np.float64)
    raw = _mahalanobis_score(f, mu_p, cov_p)
    return None if raw is None else max(sa * raw + sb, 0.0)


# ---------------------------------------------------------------------------
# BRISQUE: same 36-D features; quality from a trained ridge regressor.
# ---------------------------------------------------------------------------


def brisque_features(image: jax.Array) -> jax.Array:
    """BRISQUE's 36-D vector: 18 NSS features at two scales over the whole
    image (BRISQUE uses global fits, not patches)."""
    g = _gray(image).astype(jnp.float32)
    return _image_features36(g)


@lru_cache(maxsize=1)
def _load_brisque() -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    path = os.path.join(DATA_DIR, "brisque_model.npz")
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return z["w"], z["b"], z["mu"], z["sd"]


def brisque_expand(z: np.ndarray) -> np.ndarray:
    """Quadratic feature map [z, z^2, |z|] — a cheap stand-in for classic
    BRISQUE's RBF-SVR nonlinearity that a ridge regressor can use."""
    return np.concatenate([z, z * z, np.abs(z)], axis=-1)


def brisque_score(image: jax.Array) -> Optional[float]:
    """Trained BRISQUE score in [0, 100] (higher = worse), or None when the
    packaged regressor is absent."""
    model = _load_brisque()
    if model is None:
        return None
    w, b, mu, sd = model
    f = np.asarray(brisque_features(image), np.float64)
    if not np.all(np.isfinite(f)):
        return None
    z = brisque_expand((f - mu) / sd)
    return float(np.clip(z @ w + b, 0.0, 100.0))
