"""Rational-quadratic spline bijectors (coupling form), with circular variant.

TPU-native implementation of the neural-spline layers the reference gets from
normflows (CircularCoupledRationalQuadraticSpline /
CoupledRationalQuadraticSpline used by experiments/make_flow/make_aldp_model.py:90-136
for the alanine-dipeptide flow). Math follows Durkan et al., Neural Spline Flows
(arXiv:1906.04032): monotone piecewise rational-quadratic maps on [-B, B] with K bins,
identity tails outside; the circular variant wraps the domain periodically and ties
the boundary derivatives so the map is smooth on the circle.

Everything is vectorised gather/arithmetic on [B, D, K] tensors — pure VPU work that
XLA fuses; no data-dependent control flow.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from fab_tpu.flows.base import Bijector
from fab_tpu.flows.mlp import mlp_apply, mlp_init, mlp_param_sharding

Array = jnp.ndarray

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _normalise_bins(raw: Array, total: float, min_size: float) -> Array:
    """Softmax bin sizes with a minimum, summing to ``total``."""
    k = raw.shape[-1]
    probs = jax.nn.softmax(raw, axis=-1)
    probs = min_size + (1 - min_size * k) * probs
    return probs * total


def rational_quadratic_spline(
    x: Array,
    raw_widths: Array,
    raw_heights: Array,
    raw_derivs: Array,
    inverse: bool,
    tail_bound: float,
    circular: bool = False,
) -> Tuple[Array, Array]:
    """Elementwise monotone RQ spline on [-B, B].

    x: [...]; raw_widths/raw_heights: [..., K]; raw_derivs: [..., K-1] for linear
    tails (boundary derivatives fixed to 1) or [..., K] for circular (first == last
    derivative, raw_derivs[..., 0] used for both boundaries).
    Returns (y, log|dy/dx|) with identity (or wrapped) behaviour outside the interval.
    """
    b = tail_bound
    k = raw_widths.shape[-1]

    widths = _normalise_bins(raw_widths, 2 * b, DEFAULT_MIN_BIN_WIDTH)
    heights = _normalise_bins(raw_heights, 2 * b, DEFAULT_MIN_BIN_HEIGHT)
    x_knots = jnp.cumsum(widths, axis=-1) - b
    x_knots = jnp.concatenate(
        [jnp.full_like(x_knots[..., :1], -b), x_knots], axis=-1
    )  # [..., K+1]
    y_knots = jnp.cumsum(heights, axis=-1) - b
    y_knots = jnp.concatenate(
        [jnp.full_like(y_knots[..., :1], -b), y_knots], axis=-1
    )

    softplus = jax.nn.softplus
    # Offset chosen so raw=0 gives derivative exactly 1 -> the zero-initialised
    # conditioner yields (close to) the identity map, like the affine couplings.
    deriv_offset = jnp.log(jnp.expm1(1.0 - DEFAULT_MIN_DERIVATIVE))
    if circular:
        d_interior = DEFAULT_MIN_DERIVATIVE + softplus(raw_derivs + deriv_offset)
        # Tie the two boundary derivatives to the same value (smooth on circle).
        derivs = jnp.concatenate([d_interior, d_interior[..., :1]], axis=-1)
    else:
        d_interior = DEFAULT_MIN_DERIVATIVE + softplus(raw_derivs + deriv_offset)
        ones = jnp.ones_like(d_interior[..., :1])
        derivs = jnp.concatenate([ones, d_interior, ones], axis=-1)  # [..., K+1]

    inside = (x >= -b) & (x <= b)
    x_safe = jnp.clip(x, -b, b)

    # Locate the bin of each input.
    knots = y_knots if inverse else x_knots
    idx = jnp.clip(
        jnp.sum((x_safe[..., None] >= knots[..., :-1]).astype(jnp.int32), axis=-1)
        - 1,
        0,
        k - 1,
    )

    take = lambda a: jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]
    xk = take(x_knots[..., :-1])
    yk = take(y_knots[..., :-1])
    wk = take(widths)
    hk = take(heights)
    dk = take(derivs[..., :-1])
    dk1 = take(derivs[..., 1:])
    sk = hk / wk

    if not inverse:
        theta = (x_safe - xk) / wk
        t1m = theta * (1 - theta)
        numer = hk * (sk * theta**2 + dk * t1m)
        denom = sk + (dk1 + dk - 2 * sk) * t1m
        y = yk + numer / denom
        deriv_num = sk**2 * (dk1 * theta**2 + 2 * sk * t1m + dk * (1 - theta) ** 2)
        log_det = jnp.log(deriv_num) - 2 * jnp.log(denom)
        y = jnp.where(inside, y, x)
        log_det = jnp.where(inside, log_det, 0.0)
        return y, log_det
    else:
        # Solve the quadratic for theta given y (Durkan et al., eq. 6-8).
        y_rel = x_safe - yk
        a = hk * (sk - dk) + y_rel * (dk1 + dk - 2 * sk)
        bb = hk * dk - y_rel * (dk1 + dk - 2 * sk)
        c = -sk * y_rel
        disc = bb**2 - 4 * a * c
        disc = jnp.maximum(disc, 0.0)
        theta = 2 * c / (-bb - jnp.sqrt(disc))
        theta = jnp.clip(theta, 0.0, 1.0)
        xx = theta * wk + xk
        t1m = theta * (1 - theta)
        denom = sk + (dk1 + dk - 2 * sk) * t1m
        deriv_num = sk**2 * (dk1 * theta**2 + 2 * sk * t1m + dk * (1 - theta) ** 2)
        log_det = -(jnp.log(deriv_num) - 2 * jnp.log(denom))
        xx = jnp.where(inside, xx, x)
        log_det = jnp.where(inside, log_det, 0.0)
        return xx, log_det


@dataclasses.dataclass(frozen=True)
class SplineCoupling(Bijector):
    """Coupling layer with an RQ-spline transform of the second block.

    ``circular_mask`` (tuple of bools over the *transformed* dims, optional) marks
    periodic dims: those use the circular spline with tail_bound = pi. Mirrors the
    reference's circular coupled NSF (make_aldp_model.py:90-116).
    """

    hidden_units: int
    n_bins: int = 8
    tail_bound: float = 3.0
    n_hidden_layers: int = 2
    swap: bool = False
    circular_mask: Tuple[bool, ...] = ()
    # Circular dims among the *conditioning* block get (sin, cos) features so the
    # conditioner is continuous across the +-pi seam (analogue of normflows'
    # PeriodicFeatures used in the reference ALDP flow, make_aldp_model.py:76).
    circular_cond_mask: Tuple[bool, ...] = ()
    init_mode: str = "he_normal"  # "torch" = torch.nn.Linear defaults (see mlp_init)

    def _sizes(self, dim: int):
        d = (dim + 1) // 2
        d_cond, d_trans = (dim - d, d) if self.swap else (d, dim - d)
        return d_cond, d_trans

    def _n_cond_features(self, d_cond: int) -> int:
        if not self.circular_cond_mask:
            return d_cond
        assert len(self.circular_cond_mask) == d_cond
        return d_cond + sum(self.circular_cond_mask)

    def _cond_features(self, x_cond: Array) -> Array:
        if not self.circular_cond_mask or not any(self.circular_cond_mask):
            return x_cond
        ci = jnp.asarray([j for j, c in enumerate(self.circular_cond_mask) if c])
        angles = x_cond[..., ci]
        # Replace raw circular values with sin, append cos as extra features.
        feats = x_cond.at[..., ci].set(jnp.sin(angles))
        return jnp.concatenate([feats, jnp.cos(angles)], axis=-1)

    def _params_per_dim(self) -> int:
        # widths K + heights K + derivs K (circular) or K-1 (linear tails); use 3K
        # uniformly and ignore the last deriv for non-circular dims.
        return 3 * self.n_bins

    def init(self, key: jax.Array, dim: int, dtype=jnp.float32):
        d_cond, d_trans = self._sizes(dim)
        sizes = (
            [self._n_cond_features(d_cond)]
            + [self.hidden_units] * self.n_hidden_layers
            + [d_trans * self._params_per_dim()]
        )
        return {
            "mlp": mlp_init(
                key, sizes, zero_init_last=True, dtype=dtype,
                init_mode=self.init_mode,
            )
        }

    def _split(self, x: Array, dim: int):
        d = (dim + 1) // 2
        if self.swap:
            return x[..., d:], x[..., :d]
        return x[..., :d], x[..., d:]

    def _merge(self, x_cond: Array, y_trans: Array) -> Array:
        if self.swap:
            return jnp.concatenate([y_trans, x_cond], axis=-1)
        return jnp.concatenate([x_cond, y_trans], axis=-1)

    def _spline_params(self, params, x_cond: Array, d_trans: int):
        h = mlp_apply(params["mlp"], self._cond_features(x_cond))
        h = h.reshape(h.shape[:-1] + (d_trans, self._params_per_dim()))
        k = self.n_bins
        return h[..., :k], h[..., k : 2 * k], h[..., 2 * k :]

    def _transform(self, params, x: Array, inverse: bool):
        dim = x.shape[-1]
        _, d_trans = self._sizes(dim)
        x_cond, x_trans = self._split(x, dim)
        rw, rh, rd = self._spline_params(params, x_cond, d_trans)
        circ = self.circular_mask
        if circ:
            assert len(circ) == d_trans, "circular_mask must cover transformed dims"
        else:
            circ = (False,) * d_trans
        # Vectorise over dims, grouped by circularity (two spline calls max).
        lin_idx = tuple(j for j, c in enumerate(circ) if not c)
        circ_idx = tuple(j for j, c in enumerate(circ) if c)
        y_trans = jnp.zeros_like(x_trans)
        log_det = jnp.zeros(x.shape[:-1], x.dtype)
        if lin_idx:
            li = jnp.asarray(lin_idx)
            y_l, ld_l = rational_quadratic_spline(
                x_trans[..., li],
                rw[..., li, :],
                rh[..., li, :],
                rd[..., li, : self.n_bins - 1],
                inverse=inverse,
                tail_bound=self.tail_bound,
                circular=False,
            )
            y_trans = y_trans.at[..., li].set(y_l)
            log_det = log_det + jnp.sum(ld_l, axis=-1)
        if circ_idx:
            ci = jnp.asarray(circ_idx)
            y_c, ld_c = rational_quadratic_spline(
                x_trans[..., ci],
                rw[..., ci, :],
                rh[..., ci, :],
                rd[..., ci, :],
                inverse=inverse,
                tail_bound=float(jnp.pi),
                circular=True,
            )
            y_trans = y_trans.at[..., ci].set(y_c)
            log_det = log_det + jnp.sum(ld_c, axis=-1)
        return self._merge(x_cond, y_trans), log_det

    def forward_and_log_det(self, params, z: Array) -> Tuple[Array, Array]:
        return self._transform(params, z, inverse=False)

    def inverse_and_log_det(self, params, x: Array) -> Tuple[Array, Array]:
        return self._transform(params, x, inverse=True)

    def param_sharding(self, dim: int, model_axis: str):
        d_cond, d_trans = self._sizes(dim)
        sizes = (
            [self._n_cond_features(d_cond)]
            + [self.hidden_units] * self.n_hidden_layers
            + [d_trans * self._params_per_dim()]
        )
        return {"mlp": list(mlp_param_sharding(sizes, model_axis))}


@dataclasses.dataclass(frozen=True)
class PeriodicShift(Bijector):
    """Constant shift-and-rewrap of circular dims (log-det 0).

    Analogue of nf.flows.PeriodicShift used between ALDP flow blocks
    (make_aldp_model.py:147-152) so mode boundaries don't pin at the +-pi seam.
    """

    circular_dims: Tuple[int, ...]
    shift: float
    bound: float = float(jnp.pi)

    def init(self, key: jax.Array, dim: int, dtype=jnp.float32):
        del key, dim, dtype
        return {}

    def _apply(self, x: Array, direction: float) -> Array:
        ci = jnp.asarray(self.circular_dims)
        vals = x[..., ci] + direction * self.shift
        wrapped = jnp.mod(vals + self.bound, 2 * self.bound) - self.bound
        return x.at[..., ci].set(wrapped)

    def forward_and_log_det(self, params, z: Array):
        del params
        return self._apply(z, 1.0), jnp.zeros(z.shape[:-1], z.dtype)

    def inverse_and_log_det(self, params, x: Array):
        del params
        return self._apply(x, -1.0), jnp.zeros(x.shape[:-1], x.dtype)

    def param_sharding(self, dim: int, model_axis: str):
        return {}
