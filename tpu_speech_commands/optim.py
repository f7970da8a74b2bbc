"""Optimizers and LR schedules (reference: common/model_utils.py:17-100).

optax equivalents with Keras-default hyperparameters:
- schedules: constant | cosine (alpha=0.2 floor) | exponential (rate 0.9) |
  polynomial (end lr/100, power 1) | piecewise_constant (warmup at 1e-3 for
  500 steps, then lr, lr/10 after 90%, lr/100 after 100%)
- optimizers: adam | rmsprop (rho .9) | sgd, all with Keras epsilon=1e-7
- weight averaging: ema | swa | lookahead (reference plumbs these via
  tensorflow-addons but invokes with None; all three are implemented by
  training/averaging.WeightAverager — the optimizer chain is untouched)
"""
from __future__ import annotations

import optax

DECAY_TYPES = (None, "cosine", "exponential", "polynomial", "piecewise_constant")
OPTIMIZER_TYPES = ("adam", "rmsprop", "sgd")


def get_lr_scheduler(learning_rate: float, decay_type: str | None, decay_steps: int):
    """Build an optax schedule (model_utils.py:17-37 semantics)."""
    if decay_type:
        decay_type = decay_type.lower()
    if decay_type in (None, "none", ""):
        return optax.constant_schedule(learning_rate)
    if decay_type == "cosine":
        # final LR floor = 0.2 * learning_rate, like keras CosineDecay(alpha=0.2)
        return optax.cosine_decay_schedule(
            init_value=learning_rate, decay_steps=decay_steps, alpha=0.2
        )
    if decay_type == "exponential":
        return optax.exponential_decay(
            init_value=learning_rate,
            transition_steps=decay_steps,
            decay_rate=0.9,
            staircase=False,
        )
    if decay_type == "polynomial":
        return optax.polynomial_schedule(
            init_value=learning_rate,
            end_value=learning_rate / 100.0,
            power=1.0,
            transition_steps=decay_steps,
        )
    if decay_type == "piecewise_constant":
        # warmup stage boundaries [500, 0.9*steps, steps] with values
        # [1e-3, lr, lr/10, lr/100] (model_utils.py:31-34).  Boundaries
        # must be monotonic for join_schedules (Keras first-match
        # semantics); clamp so short runs keep the 500-step warmup.
        if decay_steps <= 500:
            # preserved reference quirk: the fixed 500-step warmup phase
            # covers the whole run (Keras PiecewiseConstantDecay answers
            # 1e-3 for every step <= 500 regardless of later boundaries),
            # so --learning_rate never takes effect.  Same numbers, but
            # say so instead of silently training at 1e-3.
            print(
                f"WARNING: piecewise_constant with decay_steps="
                f"{decay_steps} <= 500 trains entirely inside the fixed "
                "1e-3 warmup phase (reference model_utils.py:31-34 "
                "semantics); use more epochs/steps or another decay_type"
            )
        boundaries = sorted({500, max(int(decay_steps * 0.9), 501),
                             max(decay_steps, 502)})
        values = [1e-3, learning_rate, learning_rate / 10.0, learning_rate / 100.0]
        schedules = [optax.constant_schedule(v) for v in values]
        return optax.join_schedules(schedules, boundaries)
    raise ValueError("Unsupported lr decay type")


def get_optimizer(
    optim_type: str,
    learning_rate: float,
    average_type: str | None = None,
    decay_type: str | None = "cosine",
    decay_steps: int = 100000,
    injectable: bool = False,
) -> optax.GradientTransformation:
    """Build the optax optimizer chain (model_utils.py:40-58).

    ``injectable=True`` wraps the optimizer in ``optax.inject_hyperparams``
    so the learning rate lives in the optimizer state and the trainer's
    ReduceLROnPlateau equivalent can scale it between epochs (the reference
    only uses the plateau callback when no decay schedule is active,
    train.py:58-59 — pass injectable with decay_type=None).
    """
    optim_type = optim_type.lower()
    # 'None'/'none'/'' are all accepted no-decay spellings (config files
    # and argparse both produce capitalised variants) — normalise before
    # the membership test
    no_decay = (decay_type or "").lower() in ("none", "")
    if injectable and not no_decay:
        # a decay schedule re-evaluates the injected hyperparam every
        # step, silently reverting any plateau scale — reject the
        # combination instead of logging LR reductions that never stick
        raise ValueError(
            "injectable=True requires decay_type=None: a decay schedule "
            "overwrites the injected learning_rate each step, so plateau "
            "scaling would be silently reverted"
        )
    lr = get_lr_scheduler(learning_rate, decay_type, decay_steps)

    if optim_type == "adam":
        make = lambda learning_rate: optax.adam(
            learning_rate=learning_rate, b1=0.9, b2=0.999, eps=1e-7
        )
    elif optim_type == "rmsprop":
        # eps_in_sqrt=False: Keras RMSprop applies eps OUTSIDE the sqrt
        # (g / (sqrt(nu) + eps)); optax's default (inside) would floor the
        # denominator at sqrt(eps) ~ 3e-4, ~3000x the Keras 1e-7
        make = lambda learning_rate: optax.rmsprop(
            learning_rate=learning_rate, decay=0.9, eps=1e-7, momentum=0.0,
            centered=False, eps_in_sqrt=False,
        )
    elif optim_type == "sgd":
        make = lambda learning_rate: optax.sgd(
            learning_rate=learning_rate, momentum=0.0, nesterov=False
        )
    else:
        raise ValueError("Unsupported optimizer type")

    if injectable:
        # pass the RAW float when no decay schedule is active: a float
        # hyperparam lives in (mutable) optimizer state, so the trainer's
        # plateau callback can scale it; a schedule callable would be
        # re-evaluated every step, silently reverting the reduction
        inj_lr = learning_rate if decay_type in (None, "none", "") else lr
        tx = optax.inject_hyperparams(make)(learning_rate=inj_lr)
    else:
        tx = make(lr)

    # average_type (ema/swa/lookahead) is implemented by the trainer's
    # WeightAverager (training/averaging.py) rather than an optimizer wrap —
    # optax.lookahead's LookaheadParams wrapping is incompatible with the
    # plain TrainState param tree.
    _ = average_type
    return tx
