"""Shared test utilities."""

import jax

from difacto_tpu.updaters.updater import (
    PackedFMState, StackedFMState, unpack_state, unstack_state,
)


def fm_leaves(state):
    """device_get a store state in FMState (planar) form, either layout."""
    if isinstance(state, PackedFMState):
        state = jax.jit(unpack_state)(state)
    elif isinstance(state, StackedFMState):
        state = jax.jit(unstack_state)(state)
    return jax.device_get(state)
