"""jit helpers: method-level jit with `self` treated as a static argument.

Kernel-owner objects (Field, tower levels, NTTDomain, PolyOps, ...) are
hashable by identity, so whole composite operations compile ONCE per
(object, input shapes) instead of dispatching hundreds of per-op XLA
executables — critical for test speed and for production latency alike.
"""

from __future__ import annotations

import functools

import jax


def jit_method(fn=None, *, static_argnums=(), donate_argnums=()):
    """Decorator: jax.jit with argument 0 (self) static."""

    def wrap(f):
        sa = (0,) + tuple(n for n in static_argnums)
        jitted = jax.jit(f, static_argnums=sa, donate_argnums=donate_argnums)
        return functools.wraps(f)(jitted)

    if fn is not None:
        return wrap(fn)
    return wrap
