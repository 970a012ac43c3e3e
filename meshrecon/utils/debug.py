"""Numerical-safety tooling (SURVEY.md section 5, race-detection row).

The reference runs plain -O2 with no sanitizers; the jit-compiled equivalent
of sanitizers here is (a) ``jax_debug_nans`` for immediate NaN localization
and (b) ``jax.experimental.checkify`` wrapping for NaN/OOB checks inside jit
without aborting.
"""

from __future__ import annotations

import functools


def enable_nan_checks(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)


def checked(fn, *, errors=None):
    """Wrap a jittable fn with checkify; returns (err, out) on call."""
    import jax
    from jax.experimental import checkify

    if errors is None:
        errors = checkify.float_checks

    checked_fn = checkify.checkify(fn, errors=errors)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        return err, out

    return wrapper
