"""Weight averaging: EMA / SWA (reference: model_utils.py:61-100).

The reference plumbs tensorflow-addons MovingAverage / SWA / Lookahead
through `get_averaged_optimizer` (invoked with None by default).  Here:

- 'ema'  — per-step exponential moving average of parameters
  (tfa.MovingAverage(average_decay=0.99) equivalent)
- 'swa'  — equal-weight average snapshotted every `average_period` steps
  from `start_averaging` (tfa.SWA(start_averaging=0, average_period=10)
  equivalent)
- 'lookahead' — tfa.Lookahead(sync_period=6, slow_step_size=0.5)
  equivalent: every sync_period steps the slow weights move toward the
  fast weights and the fast weights are reset to them (the trainer writes
  the synced params back into the train state)

The averaged copy lives beside the train state; EMA/SWA weights are what
get evaluated and checkpointed when averaging is enabled.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

AVERAGE_TYPES = (None, "ema", "swa", "lookahead")


@struct.dataclass
class AveragerState:
    avg_params: Any
    count: jnp.ndarray  # number of snapshots folded in (swa) / steps (ema)


AVERAGE_TYPES = ("ema", "swa", "lookahead")


class WeightAverager:
    def __init__(self, average_type: str, params,
                 ema_decay: float = 0.99,
                 swa_start: int = 0, swa_period: int = 10,
                 sync_period: int = 6, slow_step_size: float = 0.5):
        self.average_type = average_type.lower()
        # ValueError, not assert: must reject user input under python -O
        if self.average_type not in AVERAGE_TYPES:
            raise ValueError(
                f"unknown average_type {average_type!r}; "
                f"expected one of {AVERAGE_TYPES}"
            )
        self.ema_decay = ema_decay
        self.swa_start = swa_start
        self.swa_period = swa_period
        self.sync_period = sync_period
        self.slow_step_size = slow_step_size
        self.state = AveragerState(
            # deep copy: the live train-state buffers are donated into the
            # jitted step and would otherwise be deleted under us
            avg_params=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                              params),
            count=jnp.asarray(0, jnp.int32),
        )

        if self.average_type == "ema":

            @jax.jit
            def update(state: AveragerState, params):
                decay = self.ema_decay
                avg = jax.tree_util.tree_map(
                    lambda a, p: decay * a + (1.0 - decay) * p,
                    state.avg_params, params,
                )
                return AveragerState(avg, state.count + 1)

        elif self.average_type == "swa":

            @jax.jit
            def update(state: AveragerState, params):
                n = state.count.astype(jnp.float32)
                avg = jax.tree_util.tree_map(
                    lambda a, p: (a * n + p) / (n + 1.0),
                    state.avg_params, params,
                )
                return AveragerState(avg, state.count + 1)

        else:  # lookahead: slow <- slow + alpha*(fast - slow)

            @jax.jit
            def update(state: AveragerState, params):
                alpha = self.slow_step_size
                avg = jax.tree_util.tree_map(
                    lambda slow, fast: slow + alpha * (fast - slow),
                    state.avg_params, params,
                )
                return AveragerState(avg, state.count + 1)

        self._update = update

    def scan_update(self, step, params, avg_state: AveragerState):
        """Traceable per-step update for use INSIDE a jitted epoch scan
        (observe() is its host-loop twin).  `step` is the post-update
        optimizer step (a traced scalar).  Returns
        (new_avg_state, new_params); new_params differs from params only
        on lookahead sync steps (fast weights reset to slow).
        """
        avg, count = avg_state.avg_params, avg_state.count
        tmap = jax.tree_util.tree_map
        if self.average_type == "ema":
            d = self.ema_decay
            new_avg = tmap(lambda a, p: d * a + (1.0 - d) * p, avg, params)
            return AveragerState(new_avg, count + 1), params
        if self.average_type == "swa":
            hit = jnp.logical_and(
                step >= self.swa_start,
                (step - self.swa_start) % self.swa_period == 0,
            )
            m = hit.astype(jnp.float32)
            n = count.astype(jnp.float32)
            new_avg = tmap(lambda a, p: a + m * (p - a) / (n + 1.0), avg, params)
            return AveragerState(new_avg, count + hit.astype(jnp.int32)), params
        # lookahead: slow <- slow + m*alpha*(fast-slow); fast <- slow on sync
        hit = jnp.logical_and(step > 0, step % self.sync_period == 0)
        m = hit.astype(jnp.float32)
        alpha = self.slow_step_size
        new_slow = tmap(lambda s, f: s + m * alpha * (f - s), avg, params)
        new_fast = tmap(lambda f, s: f + m * (s - f), params, new_slow)
        return AveragerState(new_slow, count + hit.astype(jnp.int32)), new_fast

    def observe(self, step: int, params):
        """Call after each optimizer step.  Returns replacement params for
        the train state (lookahead sync) or None."""
        if self.average_type == "ema":
            self.state = self._update(self.state, params)
        elif self.average_type == "swa":
            if step >= self.swa_start and (step - self.swa_start) % self.swa_period == 0:
                self.state = self._update(self.state, params)
        elif step > 0 and step % self.sync_period == 0:  # lookahead
            self.state = self._update(self.state, params)
            return self.state.avg_params  # fast weights reset to slow
        return None

    @property
    def params(self):
        return self.state.avg_params
