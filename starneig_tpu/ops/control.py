"""Control-flow shims: dynamic loops on backends without native while_loop.

The available TPU runtime executes static-trip loops (``lax.fori_loop`` /
``lax.scan`` with concrete bounds) but hangs on ``lax.while_loop`` (and on
fori with traced bounds, which lowers to while).  Every iterative solver in
this framework therefore expresses its state machine as (cond_fn, body_fn)
over a state pytree and runs it through :func:`make_bounded_while`: a jitted
runner applies ``chunk`` masked body steps (``cond ? body : identity``) per
call, and a tiny host loop keeps dispatching chunks until the condition
goes false — one device->host synchronization per chunk instead of per
iteration.

This mirrors the reference's architecture more closely than it may appear:
the StarNEig driver thread also polls completed status handles between
batches of submitted work (``schur/core.c:2295-2336``) — the chunk
granularity here plays the role of its task batch.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax import lax


def make_bounded_while(cond_fn: Callable[[Any], Any],
                       body_fn: Callable[[Any], Any],
                       chunk: int = 64):
    """Build a host-driven while loop from (cond_fn, body_fn).

    Args:
      cond_fn: state -> bool scalar (pure; all parameters must live in the
        state pytree — no captured tracers).
      body_fn: state -> state.
      chunk: body applications per jitted call; each inactive application is
        a masked no-op, so pick roughly the expected iteration count scale.

    Returns:
      run(state) -> final state.
    """

    @jax.jit
    def runner(state):
        def step(_, s):
            return lax.cond(cond_fn(s), body_fn, lambda x: x, s)

        state = lax.fori_loop(0, chunk, step, state)
        return state, cond_fn(state)

    def run(state, max_chunks: int = 1_000_000):
        state, more = runner(state)
        n = 0
        while bool(more):
            state, more = runner(state)
            n += 1
            if n >= max_chunks:  # safety valve; state machines carry their
                break            # own iteration caps, this should not hit
        return state

    return run
