"""KAN — Kolmogorov–Arnold Network layers (efficient-KAN style).

Re-designs `/root/reference/CViT-main/ResKan/kan.py` (== `ResVitKan/kan.py`,
380 LoC torch): each KANLinear computes SiLU-base linear + B-spline linear,
where the spline bases come from the Cox–de Boor recursion over a per-feature
grid (`kan.py:90-132`). The recursion has static depth (spline_order), so it
unrolls into a handful of fused VPU ops under jit; the spline matmul is one
MXU matmul over the flattened (in·coeff) axis.

Params keep the torch layout (out, in, ...) so checkpoint conversion is
identity. The data-dependent `update_grid` (sort + per-feature lstsq,
`kan.py:208-260`) is a pure function returning new (grid, spline_weight) —
run it as an explicit non-jitted refit step, exactly how the reference gates
it behind `update_grid=True` (`kan.py:349-363`, SURVEY.md §7.3).
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def default_grid(in_features: int, grid_size: int = 5, spline_order: int = 3,
                 grid_range=(-1, 1)) -> np.ndarray:
    h = (grid_range[1] - grid_range[0]) / grid_size
    pts = (np.arange(-spline_order, grid_size + spline_order + 1) * h
           + grid_range[0])
    return np.tile(pts[None, :], (in_features, 1)).astype(np.float32)


def b_splines(x: jnp.ndarray, grid: jnp.ndarray, spline_order: int) -> jnp.ndarray:
    """(B, in) → (B, in, grid_size + spline_order) B-spline bases
    (`kan.py:90-132`)."""
    x = x[..., None]  # (B, in, 1)
    bases = ((x >= grid[:, :-1]) & (x < grid[:, 1:])).astype(x.dtype)
    for k in range(1, spline_order + 1):
        left = (x - grid[:, : -(k + 1)]) / (grid[:, k:-1] - grid[:, : -(k + 1)])
        right = (grid[:, k + 1:] - x) / (grid[:, k + 1:] - grid[:, 1:-k])
        bases = left * bases[..., :-1] + right * bases[..., 1:]
    return bases


def curve2coeff(x: jnp.ndarray, y: jnp.ndarray, grid: jnp.ndarray,
                spline_order: int) -> jnp.ndarray:
    """Least-squares spline coefficients interpolating y(x)
    (`kan.py:134-173`): per-feature lstsq, vmapped. Returns (out, in, coeff)."""
    A = b_splines(x, grid, spline_order).transpose(1, 0, 2)  # (in, B, coeff)
    B = y.transpose(1, 0, 2)                                 # (in, B, out)
    sol = jax.vmap(lambda a, b: jnp.linalg.lstsq(a, b)[0])(A, B)
    return sol.transpose(2, 0, 1)                            # (out, in, coeff)


class KANLinear(nn.Module):
    in_features: int
    out_features: int
    grid_size: int = 5
    spline_order: int = 3
    scale_noise: float = 0.1
    scale_base: float = 1.0
    scale_spline: float = 1.0
    standalone_scaler: bool = True
    grid_range: Tuple[float, float] = (-1.0, 1.0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g0 = default_grid(self.in_features, self.grid_size, self.spline_order,
                          self.grid_range)
        grid = self.variable("kan_grid", "grid", lambda: jnp.asarray(g0))

        def base_init(key, shape, dtype=jnp.float32):
            # torch kaiming_uniform(a=sqrt(5)·scale_base) on (out, in)
            a = math.sqrt(5) * self.scale_base
            gain = math.sqrt(2.0 / (1 + a * a))
            bound = gain * math.sqrt(3.0 / shape[1])
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        def spline_init(key, shape, dtype=jnp.float32):
            noise = (jax.random.uniform(
                key, (self.grid_size + 1, self.in_features, self.out_features))
                - 0.5) * self.scale_noise / self.grid_size
            pts = jnp.asarray(
                g0.T[self.spline_order: -self.spline_order])  # (g+1, in)
            coeff = curve2coeff(pts, noise, jnp.asarray(g0), self.spline_order)
            if not self.standalone_scaler:
                coeff = coeff * self.scale_spline
            return coeff.astype(dtype)

        base_w = self.param("base_weight", base_init,
                            (self.out_features, self.in_features))
        spline_w = self.param("spline_weight", spline_init,
                              (self.out_features, self.in_features,
                               self.grid_size + self.spline_order))
        if self.standalone_scaler:
            scaler = self.param("spline_scaler", base_init,
                                (self.out_features, self.in_features))
            spline_w = spline_w * scaler[..., None]

        x = x.astype(self.dtype)
        base_out = jax.nn.silu(x) @ base_w.T.astype(self.dtype)
        bases = b_splines(x, grid.value.astype(self.dtype), self.spline_order)
        spline_out = bases.reshape(x.shape[0], -1) @ \
            spline_w.reshape(self.out_features, -1).T.astype(self.dtype)
        return base_out + spline_out


class KAN(nn.Module):
    """Stack of KANLinear layers (`kan.py:301-364`)."""
    layers_hidden: Sequence[int]
    grid_size: int = 5
    spline_order: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, (fin, fout) in enumerate(zip(self.layers_hidden,
                                            self.layers_hidden[1:])):
            x = KANLinear(fin, fout, grid_size=self.grid_size,
                          spline_order=self.spline_order, dtype=self.dtype,
                          name=f"layer{i}")(x)
        return x


def regularization_loss(spline_weight: jnp.ndarray,
                        regularize_activation: float = 1.0,
                        regularize_entropy: float = 1.0) -> jnp.ndarray:
    """Mean-|w| L1 + entropy over the per-edge distribution (`kan.py:262-298`)."""
    l1 = jnp.abs(spline_weight).mean(-1)
    total = l1.sum()
    p = l1 / total
    entropy = -jnp.sum(p * jnp.log(p))
    return regularize_activation * total + regularize_entropy * entropy


def update_grid(x: jnp.ndarray, grid: jnp.ndarray, spline_weight: jnp.ndarray,
                spline_scaler=None, grid_size: int = 5, spline_order: int = 3,
                grid_eps: float = 0.02, margin: float = 0.01):
    """Data-adaptive grid refit (`kan.py:208-260`). Pure: returns
    (new_grid, new_spline_weight). Call outside jit between epochs."""
    batch = x.shape[0]
    scaled = spline_weight if spline_scaler is None \
        else spline_weight * spline_scaler[..., None]
    splines = b_splines(x, grid, spline_order).transpose(1, 0, 2)  # (in,B,c)
    orig = scaled.transpose(1, 2, 0)                               # (in,c,out)
    unreduced = jnp.einsum("ibc,ico->bio", splines, orig)          # (B,in,out)

    x_sorted = jnp.sort(x, axis=0)
    idx = jnp.linspace(0, batch - 1, grid_size + 1).astype(jnp.int32)
    grid_adaptive = x_sorted[idx]
    step = (x_sorted[-1] - x_sorted[0] + 2 * margin) / grid_size
    grid_uniform = (jnp.arange(grid_size + 1, dtype=jnp.float32)[:, None]
                    * step + x_sorted[0] - margin)
    g = grid_eps * grid_uniform + (1 - grid_eps) * grid_adaptive
    lo = g[:1] - step * jnp.arange(spline_order, 0, -1, dtype=jnp.float32)[:, None]
    hi = g[-1:] + step * jnp.arange(1, spline_order + 1, dtype=jnp.float32)[:, None]
    new_grid = jnp.concatenate([lo, g, hi], axis=0).T  # (in, full)
    # quirk kept: the reference refits against the *scaled* spline output and
    # stores the coefficients into the raw spline_weight (`kan.py:259-260`),
    # so the scaler is effectively applied twice after a refit.
    new_weight = curve2coeff(x, unreduced, new_grid, spline_order)
    return new_grid, new_weight
