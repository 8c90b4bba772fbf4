"""Functional training state (params, BN stats, norm-schedule counters,
optimizer state) — the pure-pytree replacement for torch's in-place module
state."""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    schedule: Any          # LinearNorm warm/iter counters ({} when unused)
    opt_state: Any


def make_optimizer(lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: L2 decay folded into the gradient before
    the Adam moments (`cvit_train.py:75`), lr injected as a mutable
    hyperparam so per-epoch schedulers update it without recompiling."""

    @optax.inject_hyperparams
    def opt(learning_rate):
        steps = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
        steps.append(optax.adam(learning_rate))
        return optax.chain(*steps)

    return opt(lr)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=state.opt_state._replace(hyperparams=hp))


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])
