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
import numpy as np

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
    tail_bound,
    circular=False,
) -> Tuple[Array, Array]:
    """Elementwise monotone RQ spline on [-B, B].

    x: [...]; raw_widths/raw_heights: [..., K]; raw_derivs: [..., K-1] for linear
    tails (boundary derivatives fixed to 1) or [..., K] for circular (first == last
    derivative, raw_derivs[..., 0] used for both boundaries).
    Returns (y, log|dy/dx|) with identity (or wrapped) behaviour outside the interval.

    ``tail_bound`` and ``circular`` may also be ARRAYS broadcastable against x
    (with raw_derivs then [..., K]): per-dim bounds/circularity let one call
    transform a mixed circular/linear block — the split into two calls plus
    index-gather/scatter merging made the ALDP flow dispatch-bound on TPU
    (round-5 profile: ~43k kernel launches per training step, ~1% MFU).
    """
    k = raw_widths.shape[-1]
    if isinstance(tail_bound, (int, float)):
        b = tail_bound  # scalar: broadcasts everywhere
        bk = tail_bound  # against [..., K] tensors
    else:
        b = jnp.asarray(tail_bound, raw_widths.dtype)  # broadcastable to x
        bk = b[..., None]

    widths = _normalise_bins(raw_widths, 2 * bk, DEFAULT_MIN_BIN_WIDTH)
    heights = _normalise_bins(raw_heights, 2 * bk, DEFAULT_MIN_BIN_HEIGHT)
    x_knots = jnp.cumsum(widths, axis=-1) - bk
    x_knots = jnp.concatenate(
        [jnp.broadcast_to(-bk, x_knots[..., :1].shape).astype(x_knots.dtype),
         x_knots],
        axis=-1,
    )  # [..., K+1]
    y_knots = jnp.cumsum(heights, axis=-1) - bk
    y_knots = jnp.concatenate(
        [jnp.broadcast_to(-bk, y_knots[..., :1].shape).astype(y_knots.dtype),
         y_knots],
        axis=-1,
    )

    softplus = jax.nn.softplus
    # Offset chosen so raw=0 gives derivative exactly 1 -> the zero-initialised
    # conditioner yields (close to) the identity map, like the affine couplings.
    deriv_offset = jnp.log(jnp.expm1(1.0 - DEFAULT_MIN_DERIVATIVE))
    if isinstance(circular, bool):
        if circular:
            d_interior = DEFAULT_MIN_DERIVATIVE + softplus(raw_derivs + deriv_offset)
            # Tie the two boundary derivatives to the same value (smooth on circle).
            derivs = jnp.concatenate([d_interior, d_interior[..., :1]], axis=-1)
        else:
            d_interior = DEFAULT_MIN_DERIVATIVE + softplus(raw_derivs + deriv_offset)
            ones = jnp.ones_like(d_interior[..., :1])
            derivs = jnp.concatenate([ones, d_interior, ones], axis=-1)  # [..., K+1]
    else:
        # Mixed block: raw_derivs [..., K]; circular dims use all K (tied ends),
        # linear dims use the first K-1 as interior with unit boundaries.
        d_full = DEFAULT_MIN_DERIVATIVE + softplus(raw_derivs + deriv_offset)
        circ_d = jnp.concatenate([d_full, d_full[..., :1]], axis=-1)
        ones = jnp.ones_like(d_full[..., :1])
        lin_d = jnp.concatenate([ones, d_full[..., : k - 1], ones], axis=-1)
        derivs = jnp.where(circular[..., None], circ_d, lin_d)

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

    # One-hot contraction instead of take_along_axis: a K=8 multiply+sum fuses
    # into the surrounding elementwise chain, where a gather becomes its own
    # (dispatch-bound) kernel on TPU.
    onehot = (
        jnp.arange(k, dtype=jnp.int32) == idx[..., None]
    ).astype(x_safe.dtype)
    take = lambda a: jnp.sum(a * onehot, axis=-1)
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
        mask = jnp.asarray(self.circular_cond_mask, bool)
        # Replace raw circular values with sin (static-mask select, not
        # gather+scatter), append cos as extra features (one static gather).
        feats = jnp.where(mask, jnp.sin(x_cond), x_cond)
        return jnp.concatenate([feats, jnp.cos(x_cond[..., ci])], axis=-1)

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
        if not any(circ):
            # Pure-linear block: scalar fast path (e.g. LGCP / GMM spline flows).
            y_trans, ld = rational_quadratic_spline(
                x_trans, rw, rh, rd[..., : self.n_bins - 1],
                inverse=inverse, tail_bound=self.tail_bound, circular=False,
            )
        else:
            # Mixed block: ONE spline call with per-dim tail bound/circularity
            # (static constant vectors) — no index gathers, no scatter-merge.
            # The former two-call + .at[].set form cost ~6x the kernel count.
            circ_vec = jnp.asarray(circ, bool)
            tb_vec = jnp.where(
                circ_vec, jnp.float32(jnp.pi), jnp.float32(self.tail_bound)
            ).astype(x_trans.dtype)
            y_trans, ld = rational_quadratic_spline(
                x_trans, rw, rh, rd,
                inverse=inverse, tail_bound=tb_vec, circular=circ_vec,
            )
        log_det = jnp.sum(ld, axis=-1)
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
        # Full-width select on a static mask instead of gather + scatter: one
        # fused elementwise kernel (the .at[ci].set form paid a gather AND a
        # dynamic-update-slice per block on TPU).
        mask = np.zeros(x.shape[-1], bool)
        mask[list(self.circular_dims)] = True
        mask = jnp.asarray(mask)
        vals = x + direction * self.shift
        wrapped = jnp.mod(vals + self.bound, 2 * self.bound) - self.bound
        return jnp.where(mask, wrapped, x)

    def forward_and_log_det(self, params, z: Array):
        del params
        return self._apply(z, 1.0), jnp.zeros(z.shape[:-1], z.dtype)

    def inverse_and_log_det(self, params, x: Array):
        del params
        return self._apply(x, -1.0), jnp.zeros(x.shape[:-1], x.dtype)

    def param_sharding(self, dim: int, model_axis: str):
        return {}
